package graft.pipeline

import graft.media.{DefaultMedia, MediaResolver}
import graft.model.Doc
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-corpus record linkage: which documents in `left` match which in
  * `right`, WITHOUT clustering either side internally — the bipartite
  * counterpart of [[Pipeline.run]]'s self-dedup (classic ER linkage, e.g.
  * linking a new vendor feed against a master catalog). Generalizes the
  * reference's one-target compare (`dedupe.go:127-146`) from 1×N to M×N.
  *
  * Scale shape mirrors the pipeline's: both sides derive signatures with a
  * narrow map, the band equi-join carries only compact (doc_id, band key,
  * prefilter) rows, candidacy uses the same per-channel vote (media: any
  * shared block key; text: ≥ cfg.minTextBands shared MinHash bands), and
  * only gated survivors reach the O(n²) string scorers via
  * [[Pairs.score]]. Because the join is cross-side only, neither side's
  * internal pairs are ever generated — linking a 1M-doc batch against a
  * 10^12-doc corpus costs O(batch × bucket), not O(corpus²).
  *
  * Skew: keys whose combined side cardinality exceeds `cfg.hotBlockSize`
  * are salted — the LEFT side (the batch, in batch-vs-corpus usage) is
  * replicated over all `cfg.saltFactor` salts while each right-side row
  * keeps one salt, so every cross pair is produced exactly once and the
  * large side is never replicated. Keys whose pair volume ln×rn exceeds
  * `cfg.maxBlockSize`² are degenerate and dropped with logged counts —
  * the product rule makes a self-link's drop set identical to the
  * self-dedup pipeline's (bsize² > max² ⇔ bsize > max). The census is an
  * inner join of per-side key counts — keys present on only one side
  * produce no pairs and never reach the driver.
  *
  * Contract: doc_ids must be unique WITHIN each side (they key the
  * signature rejoin), and EQUAL ids across sides denote the SAME record —
  * the diagonal is excluded, which is what makes a self-link reproduce
  * the self-dedup pipeline's direct edge set (LinkageSpec). Two corpora
  * with independent id namespaces must be disambiguated first (e.g.
  * prefix each side's ids), or a coincidental id collision between two
  * DIFFERENT records would silently suppress their match.
  */
object Linkage {

  final case class LinkStats(droppedKeys: Long, saltedKeys: Long)

  final case class LinkResult(
      matches: DataFrame, // (left_id, right_id, score) — is_dup pairs only
      stats: LinkStats,
      release: () => Unit)

  def link(spark: SparkSession, left: Dataset[Doc], right: Dataset[Doc],
           cfg: GraftConfig = GraftConfig(),
           resolver: MediaResolver = DefaultMedia): LinkResult = {
    import spark.implicits._
    val lSigs = Signatures.derive(left, cfg, resolver)(spark).map(_.sig)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rSigs = Signatures.derive(right, cfg, resolver)(spark).map(_.sig)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val inner = linkSigs(spark, lSigs, rSigs, cfg)
    inner.copy(release = () => { inner.release(); lSigs.unpersist(); rSigs.unpersist(); () })
  }

  /** Signature-level entry point: link two already-derived signature sets.
    * Used by [[link]] and by [[Incremental]] (which links a new batch's
    * signatures against the persisted corpus signature table).
    *
    * `rBands`: optionally the right side's PREBUILT band relation (the
    * schema of [[Blocking.bandRowsDF]]) — at production scale the master
    * corpus's band table is checkpointed by the previous run, and
    * re-deriving it here would cost O(corpus) per batch, swamping the
    * O(batch × bucket) the bipartite join itself costs. When given, it is
    * used as-is and NOT unpersisted by `release`.
    */
  def linkSigs(spark: SparkSession, lSigs: Dataset[graft.model.DocSig],
               rSigs: Dataset[graft.model.DocSig],
               cfg: GraftConfig,
               rBands: Option[DataFrame] = None): LinkResult = {
    implicit val s: SparkSession = spark

    val lB = Blocking.bandRowsDF(lSigs, cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rBOwned = rBands.isEmpty
    val rB = rBands.getOrElse(Blocking.bandRowsDF(rSigs, cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

    // census of joinable keys only (inner join of per-side counts): hot and
    // degenerate keys are a bounded handful by construction, so the collect
    // is driver-safe the same way the pipeline's census is
    // degenerate test in DIVISION form (ln > maxPairs div rn ⟺ ln·rn >
    // maxPairs for positive integers): the direct product wraps Long at
    // the design point (ln = 10^9, rn = 10^10 ⇒ 10^19 > 2^63), which would
    // misclassify an ultra-degenerate key as merely hot and salt-join it
    val maxPairs = cfg.maxBlockSize.toLong * cfg.maxBlockSize.toLong
    val census = lB.groupBy("block_key").agg(count(lit(1)).as("ln"))
      .join(rB.groupBy("block_key").agg(count(lit(1)).as("rn")), Seq("block_key"))
      .filter(col("ln") + col("rn") > cfg.hotBlockSize.toLong ||
        expr(s"ln > $maxPairs div rn"))
      .collect()
    val degKeys = census.filter(r => r.getLong(1) > maxPairs / r.getLong(2))
    val hotKeys = census.filter(r => r.getLong(1) <= maxPairs / r.getLong(2))
    if (degKeys.nonEmpty)
      System.err.println(s"[graft] linkage: dropped ${degKeys.length} degenerate keys")
    val stats = LinkStats(degKeys.length.toLong, hotKeys.length.toLong)

    val degSet = degKeys.map(_.getLong(0)).toSet
    val hotSet = hotKeys.map(_.getLong(0)).toSet
    val isDeg = udf((k: Long) => degSet.contains(k))
    val isHot = udf((k: Long) => hotSet.contains(k))
    def live(b: DataFrame) = if (degSet.isEmpty) b else b.filter(!isDeg(col("block_key")))
    def normal(b: DataFrame) = if (hotSet.isEmpty) live(b) else live(b).filter(!isHot(col("block_key")))
    def hot(b: DataFrame) = if (hotSet.isEmpty) b.limit(0) else live(b).filter(isHot(col("block_key")))

    // oriented cross join: a = left id, b = right id (no a<b
    // canonicalization — sides are distinct relations); the prefilter
    // cascade is the SHARED Blocking.prefilteredPairs, with the diagonal
    // dropped: equal ids across sides denote the same record by contract
    def crossJoin(l0: DataFrame, r0: DataFrame, extraKey: Seq[String]): DataFrame =
      Blocking.prefilteredPairs(l0, r0, extraKey, _ =!= _, cfg)

    // salting orientation: replicate the LEFT (batch) side over the salts,
    // give each RIGHT (corpus) row one salt — the large side is scanned
    // once, never replicated, and each cross pair exists at exactly one salt
    val normalPairs = crossJoin(normal(lB), normal(rB), Nil)
    val sf = cfg.saltFactor
    val hotLeft = hot(lB).withColumn("salt", explode(sequence(lit(0), lit(sf - 1))))
    val hotRight = hot(rB).withColumn("salt",
      pmod(xxhash64(col("doc_id")), lit(sf.toLong)).cast("int"))
    val hotPairs = crossJoin(hotLeft, hotRight, Seq("salt"))

    val cand = normalPairs.unionByName(hotPairs)
      .groupBy(col("a"), col("b"))
      .agg(min(col("media_dist")).as("media_dist"), min(col("sim_ham")).as("sim_ham"),
        sum(when(col("is_text"), 1L).otherwise(0L)).as("n_text_bands"))
      .filter(col("media_dist") < cfg.mediaThreshold ||
        col("n_text_bands") >= cfg.minTextBands)
      .drop("n_text_bands")

    // per-side score tables: `a` ids resolve only in lSigs and `b` ids only
    // in rSigs, so the corpus side is never unioned or dedup-shuffled (and a
    // self-link with shared ids cannot fan candidates into duplicate rows)
    val scored = Pairs.scoreSides(cand, lSigs, rSigs, cfg)
    val matches = scored.filter(col("is_dup"))
      .select(col("a").as("left_id"), col("b").as("right_id"), col("score"))

    LinkResult(matches, stats,
      () => { lB.unpersist(); if (rBOwned) { rB.unpersist() }; () })
  }
}
