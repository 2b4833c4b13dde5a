package graft

import graft.pipeline.Swoosh
import graft.synth.Corpus
import org.apache.spark.sql.functions._

/** Bench-scale evidence for the Swoosh delta rounds: runs the match-merge
  * fixpoint over the deterministic labeled bench corpus (same generator
  * and seed as graft.Bench) and prints per-round candidate/match volumes
  * plus wall time. The delta-round claim is visible directly: round 1+
  * candidate counts collapse to O(changed × bucket) while round 0 (as
  * printed — rounds are 0-based) scans the full banded candidacy.
  *
  *   SWOOSH_ENTITIES=60000 sbt "Test/runMain graft.DiagSwoosh"
  */
object DiagSwoosh {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val entities = sys.env.getOrElse("SWOOSH_ENTITIES", "60000").toInt
    val docs = Corpus.generateDistributed(spark,
        Corpus.Params(entities = entities, minWords = 150, maxWords = 400, seed = 42))
      .map(_.doc)(org.apache.spark.sql.Encoders.product[graft.model.Doc])
    val base = docs.map(d => (d.doc_id, d.concatText)).toDF("doc_id", "text")
      .cache()
    val n = base.count()

    val (toks, mins) = SparkEntry.swooshInputs(base) // the shipping derivation

    val t0 = System.nanoTime()
    val resolved = Swoosh.resolve(toks, mins, 0.8, logRounds = true)(spark)
    val entitiesOut = resolved.select("entity_id").distinct().count()
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"[graft] swoosh: $n docs -> $entitiesOut entities in $wall%.1f s " +
      f"(${n / wall}%.1f docs/s)")
    spark.stop()
  }
}
