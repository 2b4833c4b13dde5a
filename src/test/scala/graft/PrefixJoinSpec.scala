package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for q_prefix_join (PPJoin-style lossless prefix filter)
  * and q_minhash_err (estimator-calibration report).
  *
  * The DuckDB oracle for q_prefix_join is brute force, so the driver's
  * compare already proves losslessness engine-to-engine; these tests prove
  * it WITHIN Spark (same tokenization, same rounding) on both a planted
  * boundary corpus and the real sf0.01 table, so a regression is caught at
  * `sbt test` time rather than at driver time.
  */
class PrefixJoinSpec extends AnyFunSuite with SparkTestBase {

  private val sfDir = "/root/testdata/sf0.01"

  private def plantedDir(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-prefixjoin").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("web"))
      .withColumn("n_chars", length($"text").cast("long"))
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    dir
  }

  /** Brute-force all-pairs Jaccard >= 0.6 with the query's exact
    * tokenization and rounding.
    */
  private def brute(dir: String) = {
    val d = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"),
      array_distinct(split(trim(substring(col("text"), 1, 120)), "\\s+")).as("toks"))
    d.select(col("doc_id").as("a"), col("toks").as("tA"))
      .join(d.select(col("doc_id").as("b"), col("toks").as("tB")), col("a") < col("b"))
      .withColumn("inter", size(array_intersect(col("tA"), col("tB"))))
      .withColumn("jac", round(col("inter").cast("double") /
        (size(col("tA")) + size(col("tB")) - col("inter")), 6))
      .filter(col("jac") >= 0.6)
      .select("a", "b", "jac")
  }

  test("q_prefix_join: planted boundary cases (above, exactly-at, below threshold)") {
    val dir = plantedDir(Seq(
      (1L, "a b c d e"), // jac(1,2) = 4/6 = 0.6667 -> pair
      (2L, "a b c d f"),
      (3L, "a b x y z"), // jac(1,3) = 2/8 = 0.25  -> no
      (4L, "p q r s t"), // disjoint               -> no
      (5L, "m n o u"), // jac(5,6) = 3/5 = 0.6 exactly -> pair (>= is inclusive)
      (6L, "m n o v")))
    val got = SparkEntry.queries("q_prefix_join")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (5L, 6L)))
  }

  test("q_prefix_join: lossless vs brute force on sf0.01") {
    val got = SparkEntry.queries("q_prefix_join")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = brute(sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want)
    assert(want.nonEmpty) // the corpus actually exercises the join
  }

  test("q_minhash_err: bucket counts partition the banded candidate set; est/jac in [0,1]") {
    val rep = SparkEntry.queries("q_minhash_err")(spark, sfDir).collect()
    val nPairs = rep.map(_.getLong(1)).sum
    val nCand = SparkEntry.sBandCandidates(spark, sfDir).count()
    assert(nPairs == nCand)
    rep.foreach { r =>
      val (n, sumEst, sumJac, sumErr) =
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(sumEst >= 0.0 && sumEst <= n.toDouble + 1e-9)
      assert(sumJac >= 0.0 && sumJac <= n.toDouble + 1e-9)
      assert(sumErr >= 0.0 && sumErr <= n.toDouble + 1e-9)
    }
  }
}
