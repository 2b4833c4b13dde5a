package graft.pipeline

import graft.model.DocSig
import graft.text.{JaroWinkler, MinHash}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Phase-2 exact scoring of candidate pairs.
  *
  * Cheap→expensive fusion order (SURVEY.md §7.5): the blocking stage already
  * applied the exact media predicate and a loose SimHash prefilter using only
  * compact carried columns; only surviving candidates pay the join back to
  * full signatures and the string scorers here.
  *
  * Decision rule — per-modality linear scores, OR-combined:
  *   - media: Hamming(sig_a, sig_b) < mediaThreshold — bit-for-bit the
  *     reference's radius predicate (`vptree/vptree.go:167`, strict `<`).
  *   - text:  wJw·JW + wLev·(1−levNorm) + wMinhash·jaccardEst ≥ tau — the
  *     graft's learned linear cutoff mirroring that hash-distance cutoff.
  * Independent modalities are independent evidence; either one confidently
  * matching makes the pair an edge.
  */
object Pairs {

  private val minhashEstUdf = udf { (a: Seq[Long], b: Seq[Long]) =>
    if (a == null || b == null || a.isEmpty || b.isEmpty || a.length != b.length) 0.0
    else {
      var agree = 0
      var i = 0
      while (i < a.length) { if (a(i) == b(i)) agree += 1; i += 1 }
      agree.toDouble / a.length
    }
  }

  private val jwUdf = udf { (a: String, b: String) =>
    if (a == null || b == null || a.isEmpty || b.isEmpty) 0.0
    else JaroWinkler.jaroWinkler(a, b)
  }

  /** candidates: (a, b, media_dist, sim_ham). Returns scored pairs with a
    * boolean `is_dup`; edges are the is_dup projection.
    */
  def score(candidates: DataFrame, sigs: Dataset[DocSig], cfg: GraftConfig)(
      implicit spark: SparkSession): DataFrame = {
    val cap = cfg.scoreTextCap
    val side = sigs.toDF().select(
      col("doc_id"),
      col("minhash"),
      substring(col("text"), 1, cap).as("text_cap"))

    val withA = candidates.join(
      side.withColumnRenamed("doc_id", "a")
        .withColumnRenamed("minhash", "mh_a")
        .withColumnRenamed("text_cap", "t_a"), Seq("a"))
    val withB = withA.join(
      side.withColumnRenamed("doc_id", "b")
        .withColumnRenamed("minhash", "mh_b")
        .withColumnRenamed("text_cap", "t_b"), Seq("b"))

    val hasText = length(col("t_a")) > 0 && length(col("t_b")) > 0
    val maxLen = greatest(length(col("t_a")), length(col("t_b")))
    // cheap-feature cascade: the O(k) minhash estimate gates the O(n²)
    // string scorers — band-collision candidates with low Jaccard estimate
    // (and outside the media radius) cannot reach tau and are cut here
    val gated = withB
      .withColumn("minhash_est", minhashEstUdf(col("mh_a"), col("mh_b")))
      .filter(col("media_dist") < cfg.mediaThreshold ||
        col("minhash_est") >= cfg.minhashGate)
    val scored = gated
      .withColumn("jw", jwUdf(col("t_a"), col("t_b")))
      .withColumn("lev_norm",
        when(hasText, levenshtein(col("t_a"), col("t_b")) / maxLen.cast("double"))
          .otherwise(lit(1.0)))
      .withColumn("text_score",
        when(hasText,
          lit(cfg.wJw) * col("jw") +
            lit(cfg.wLev) * (lit(1.0) - col("lev_norm")) +
            lit(cfg.wMinhash) * col("minhash_est"))
          .otherwise(lit(0.0)))
      .withColumn("media_sim",
        when(col("media_dist") < 9999,
          lit(1.0) - col("media_dist").cast("double") / lit(64.0 * cfg.slots))
          .otherwise(lit(0.0)))
      .withColumn("is_dup",
        (col("media_dist") < cfg.mediaThreshold) ||
          (hasText && col("text_score") >= cfg.tau))
      .withColumn("score", greatest(
        when(col("media_dist") < 9999, col("media_sim")).otherwise(lit(0.0)),
        col("text_score")))
    scored.select("a", "b", "media_dist", "minhash_est", "jw", "lev_norm",
      "text_score", "score", "is_dup")
  }

  def edges(scored: DataFrame): DataFrame =
    scored.filter(col("is_dup")).select(col("a").as("src"), col("b").as("dst"))
}
