package graft.pipeline

import graft.model.DocSig
import graft.text.{Hashing, MinHash, SimHash}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Blocking stage: candidate generation by equality on LSH band keys —
  * the scalable replacement for the reference's VP-tree radius search
  * (`vptree/vptree.go:100-192`). A metric tree is a single-address-space
  * index; band blocking turns the same radius predicate into plain
  * equi-joins Catalyst can plan, shuffle-partition, and AQE-rebalance.
  *
  * Recall (SURVEY.md §7.4.1): with 16 × 4-bit bands per 64-bit media hash,
  * any pair within Hamming distance ≤ 15 shares an exact band (pigeonhole);
  * 16…21 is caught probabilistically plus via the text modality; within-block
  * exact re-scoring makes precision exact. Text: `cfg.textBands` MinHash
  * bands (default 32 bands × 4 rows of the 128-value signature — see
  * GraftConfig for the miss-probability math).
  */
object Blocking {

  /** Carries only compact prefilter columns: media hashes are 1-4 longs,
    * the simhash 1 long; the heavy signature columns (minhash, text) stay in
    * the signature table and are joined only for gated survivors in phase 2.
    */
  final case class BlockRow(block_key: Long, doc_id: String, media: Array[Long],
                            slots: Int, simhash: Long, hasText: Boolean)

  /** Block keys for one 64-bit media hash: one key per combination of
    * `blocksPerKey` blocks of `blockBits` bits (Manku-style tables; see
    * GraftConfig). The combination index and slot are mixed into the key so
    * tables never cross-collide.
    */
  def mediaBandKeys(hash: Long, blockBits: Int, blocksPerKey: Int, slot: Int): Array[Long] = {
    val nBlocks = 64 / blockBits
    val mask = if (blockBits == 64) -1L else (1L << blockBits) - 1L
    @inline def block(i: Int): Long = (hash >>> (i * blockBits)) & mask
    val out = Array.newBuilder[Long]
    var comboId = 0
    if (blocksPerKey == 1) {
      var b = 0
      while (b < nBlocks) {
        out += Hashing.hash64(Hashing.hash64(0x6d62L + b, block(b)), slot.toLong)
        b += 1
      }
    } else if (blocksPerKey == 2) {
      // the bench/scale profile (2-of-8): direct pair loop in the same
      // comboId order as the generic enumerator below — identical keys,
      // no per-key List allocation
      var b1 = 0
      while (b1 < nBlocks) {
        var b2 = b1 + 1
        while (b2 < nBlocks) {
          var h = Hashing.mix64(0x6d6232L + comboId)
          h = Hashing.hash64(h, block(b1))
          h = Hashing.hash64(h, block(b2))
          out += Hashing.hash64(h, slot.toLong)
          comboId += 1
          b2 += 1
        }
        b1 += 1
      }
    } else {
      // enumerate k-combinations of block indices (k is small: 2 or 3)
      def rec(start: Int, chosen: List[Int]): Unit = {
        if (chosen.length == blocksPerKey) {
          var h = Hashing.mix64(0x6d6232L + comboId)
          chosen.reverse.foreach(b => h = Hashing.hash64(h, block(b)))
          out += Hashing.hash64(h, slot.toLong)
          comboId += 1
        } else {
          var b = start
          while (b < nBlocks) { rec(b + 1, b :: chosen); b += 1 }
        }
      }
      rec(0, Nil)
    }
    out.result()
  }

  /** One row per (doc, band key). Narrow flatMap — no shuffle here. */
  def blockRows(sigs: Dataset[DocSig], cfg: GraftConfig)(
      implicit spark: SparkSession): Dataset[BlockRow] = {
    import spark.implicits._
    val blockBits = cfg.mediaBlockBits
    val blocksPerKey = cfg.mediaBlocksPerKey
    val textBands = cfg.textBands
    sigs.flatMap { s =>
      val keys = Array.newBuilder[Long]
      // media block-combination keys, per span and slot (slot mixed into the
      // key so a dHash row-band never collides with a col-band block)
      var i = 0
      while (i < s.media.length) {
        keys ++= mediaBandKeys(s.media(i), blockBits, blocksPerKey, i % s.slots)
        i += 1
      }
      // text bands over the minhash signature
      if (s.minhash.nonEmpty) keys ++= MinHash.bandKeys(s.minhash, textBands)
      val hasText = s.text != null && s.text.nonEmpty
      keys.result().distinct.iterator.map { k =>
        BlockRow(k, s.doc_id, s.media, s.slots, s.simhash, hasText)
      }
    }
  }

  /** Summed-slot Hamming distance, minimized over media-span pairs —
    * the reference metric (`vptree/vptree.go:60-69`) generalized to
    * multi-span docs. Sentinel 9999 when either side has no media. Native
    * codegen expression (graft.functions.MediaDistExpr) — the hottest
    * predicate in the pipeline runs inside the band join's codegen span.
    */
  def mediaDistUdf(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
                   slots: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    coalesce(graft.functions.GraftFunctions.mediaDist(a, b, slots), lit(9999))

  final case class BlockStats(droppedBlocks: Long, droppedRows: Long, saltedBlocks: Long)

  /** Candidate pair generation: salted self-join within blocks + cheap
    * prefilter + per-pair dedup across bands.
    *
    * Skew handling is explicit, never silent:
    *  - blocks > maxBlockSize are degenerate (near-duplicate farms / empty
    *    text): dropped with logged counts;
    *  - blocks > hotBlockSize are salted: the left side keeps one salt,
    *    the right side is replicated over all `saltFactor` salts, so every
    *    unordered pair is produced exactly once at the left doc's salt —
    *    the shuffle key becomes (block_key, salt), splitting hot blocks
    *    across reducers. AQE skew-join remains on as backstop.
    *
    * Returns (a, b, media_dist) with a < b, deduped across bands.
    */
  /** All band keys of one signature row, tagged by channel: media block
    * tables vs text MinHash bands. The tag drives per-channel candidacy
    * rules downstream (media: any shared key; text: ≥ cfg.minTextBands
    * shared keys — the multi-band vote that keeps random band collisions
    * from growing O(N²) on low-diversity corpora).
    */
  private def bandKeysUdf(cfg: GraftConfig) = udf {
    (media: Seq[Long], slots: Int, minhash: Seq[Long]) =>
      // two PRIMITIVE long arrays (media keys, text keys) instead of one
      // Array[(Long, Boolean)]: the tuple form boxed every key long (3.5M
      // tuples per bench corpus pass); the channel flag is re-attached by
      // codegen transform/explode in [[bandRowsDF]]. Per-channel sort+dedup
      // preserves the old (key, flag)-distinct semantics — downstream use
      // is purely set-shaped (explode → equi-join / census), so element
      // order is immaterial.
      def dedup(a: Array[Long]): Array[Long] = {
        if (a.length <= 1) return a
        java.util.Arrays.sort(a)
        var out = 0
        var r = 0
        while (r < a.length) {
          if (out == 0 || a(r) != a(out - 1)) { a(out) = a(r); out += 1 }
          r += 1
        }
        if (out == a.length) a else java.util.Arrays.copyOf(a, out)
      }
      val m = Array.newBuilder[Long]
      var i = 0
      while (i < media.length) {
        m ++= mediaBandKeys(media(i), cfg.mediaBlockBits, cfg.mediaBlocksPerKey, i % slots)
        i += 1
      }
      val t =
        if (minhash.nonEmpty) MinHash.bandKeys(minhash.toArray, cfg.textBands)
        else Array.emptyLongArray
      (dedup(m.result()), dedup(t))
  }

  /** Columnar band-row relation: one row per (doc, band key) with the
    * compact prefilter payload — (doc_id, media, slots, simhash, hasText,
    * block_key, is_text). ONE udf call per document emitting its ~44 band
    * keys, exploded natively — versus a typed flatMap, this keeps the
    * 40-80M-row block relation inside whole-stage codegen instead of paying
    * per-row object/encoder churn. Shared by the self-join pipeline
    * ([[candidatePairs]]) and cross-corpus linkage ([[Linkage.link]]).
    */
  def bandRowsDF(sigs: Dataset[DocSig], cfg: GraftConfig): DataFrame =
    sigs.toDF().select(
      col("doc_id"), col("media"), col("slots"), col("simhash"),
      (col("text").isNotNull && length(col("text")) > 0).as("hasText"),
      bandKeysUdf(cfg)(col("media"), col("slots"), col("minhash")).as("bk2"))
      // re-attach the channel flag in codegen: media keys false, text true
      .select(col("doc_id"), col("media"), col("slots"), col("simhash"),
        col("hasText"),
        explode(concat(
          transform(col("bk2._1"), k => struct(k.as("_1"), lit(false).as("_2"))),
          transform(col("bk2._2"), k => struct(k.as("_1"), lit(true).as("_2"))))).as("bk"))
      .select(col("doc_id"), col("media"), col("slots"), col("simhash"),
        col("hasText"), col("bk._1").as("block_key"), col("bk._2").as("is_text"))

  /** Band equi-join + cheap prefilter cascade over two band-row relations
    * ([[bandRowsDF]] schema), shared by the self-join pipeline and
    * cross-corpus [[Linkage]]: ONE implementation of the media-radius /
    * SimHash gate, so a prefilter tuning cannot silently diverge between
    * the two (the self-link ≡ pipeline-edge-set equivalence LinkageSpec
    * gates depends on it). `idCond` is the pair predicate — `_ < _`
    * canonical dedup for the self-join, `_ =!= _` diagonal drop for the
    * cross join. Output: (a = l.doc_id, b = r.doc_id, media_dist,
    * sim_ham, is_text).
    */
  private[pipeline] def prefilteredPairs(left: DataFrame, right: DataFrame,
      extraKey: Seq[String],
      idCond: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column,
      cfg: GraftConfig): DataFrame = {
    val l = left.alias("l")
    val r = right.alias("r")
    val keyCond = (Seq("block_key") ++ extraKey)
      .map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _)
    // SHUFFLE_HASH: the self-join otherwise plans sort-merge — two full
    // sorts of the band relation (443 MB at the bench corpus), the largest
    // exchange in the pipeline. The build side is one partition of the
    // band relation: blocks are census-bounded (degenerate dropped, hot
    // salted), so per-task build size tracks the shuffle partition sizing
    // rather than any single key.
    l.hint("SHUFFLE_HASH").join(r, keyCond && idCond(col("l.doc_id"), col("r.doc_id")))
      .withColumn("media_dist",
        mediaDistUdf(col("l.media"), col("r.media"), col("l.slots")))
      .withColumn("sim_ham",
        when(col("l.hasText") && col("r.hasText"),
          bit_count(col("l.simhash").bitwiseXOR(col("r.simhash"))))
          .otherwise(lit(9999)))
      .filter(col("media_dist") < cfg.mediaThreshold ||
        col("sim_ham") < cfg.simhashPrefilter)
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"),
        col("media_dist"), col("sim_ham"), col("l.is_text").as("is_text"))
  }

  def candidatePairs(sigs: Dataset[DocSig], cfg: GraftConfig)(
      implicit spark: SparkSession): (DataFrame, BlockStats, () => Unit) = {
    // Persisted PRE-PARTITIONED BY block_key: the band relation has 3
    // consumers (census, join left, join right) that all need a
    // block_key clustering — caching the relation already hash-partitioned
    // means the census groupBy and BOTH self-join sides read co-partitioned
    // cache with ZERO further exchanges (one 443 MB-at-bench shuffle
    // instead of three). Hash partitioning by the census-bounded block key
    // cannot skew a partition beyond maxBlockSize, and the (block_key,
    // salt) hot join still satisfies its clustering from the block_key
    // partitioning (partition keys ⊆ clustering keys). The rows are
    // compact (doc_id, 1-4 media longs, simhash, key), so MEMORY_AND_DISK
    // holds them in memory at bench scale and spills rather than OOMs at
    // cluster scale. Released by the cleanup thunk once candidates are
    // materialized.
    val b = bandRowsDF(sigs, cfg)
      .repartition(spark.sessionState.conf.numShufflePartitions, col("block_key"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // Hot/degenerate block census via map-side-combined groupBy — NOT a
    // window over the full block table: a window would shuffle+sort every
    // block row (the largest relation in the pipeline) just to tag sizes,
    // while the interesting keys (hot or degenerate) are a handful.
    val tCensus = System.nanoTime()
    val census = b.groupBy("block_key").agg(count(lit(1)).as("bsize"))
      .filter(col("bsize") > math.min(cfg.hotBlockSize, cfg.maxBlockSize))
      .collect()
    System.err.println(f"[graft]   census: ${(System.nanoTime() - tCensus) / 1e9}%.2f s, ${census.length} hot/deg keys")
    val degKeys = census.filter(_.getLong(1) > cfg.maxBlockSize)
    val hotKeys = census.filter(r => r.getLong(1) <= cfg.maxBlockSize)
    val stats0 = BlockStats(degKeys.length.toLong, degKeys.map(_.getLong(1)).sum,
      hotKeys.length.toLong)

    val degSet = degKeys.map(_.getLong(0)).toSet
    val hotSet = hotKeys.map(_.getLong(0)).toSet
    val isDeg = udf((k: Long) => degSet.contains(k))
    val isHot = udf((k: Long) => hotSet.contains(k))
    // fast path: no hot/degenerate keys (the common case) — skip the
    // per-row membership filters entirely
    val live = if (degSet.isEmpty) b else b.filter(!isDeg(col("block_key")))
    val normal = if (hotSet.isEmpty) live else live.filter(!isHot(col("block_key")))
    val hot = if (hotSet.isEmpty) live.limit(0) else live.filter(isHot(col("block_key")))

    def pairJoin(left: DataFrame, right: DataFrame, extraKey: Seq[String]): DataFrame =
      prefilteredPairs(left, right, extraKey, _ < _, cfg)

    val normalPairs = pairJoin(normal, normal, Nil)

    val s = cfg.saltFactor
    val hotLeft = hot.withColumn("salt",
      pmod(xxhash64(col("doc_id")), lit(s.toLong)).cast("int"))
    val hotRight = hot.withColumn("salt", explode(sequence(lit(0), lit(s - 1))))
    val hotPairs = pairJoin(hotLeft, hotRight, Seq("salt"))

    // Per-channel candidacy vote (Broder-style multi-band agreement):
    // media pairs qualify on ANY shared block key (pigeonhole recall
    // guarantee), text-only pairs need >= minTextBands shared bands. One
    // shared 4-row band is a coin-flip event at corpus-background Jaccard
    // (~0.05 ⇒ p ≈ 6e-6/band, O(N²) expected collisions); two independent
    // bands squares that (~4e-11) while true near-dups (Jaccard ≥ 0.8,
    // p ≥ 0.4/band over 32 bands) still collide on ≥2 with prob ≈ 1 —
    // measured: candidate volume at 850k docs fell from 8.2/doc
    // (quadratic regime) to O(1)/doc.
    //
    // Known recall narrowing (documented, accepted): a pair reachable ONLY
    // via a shared MEDIA band whose media_dist >= mediaThreshold but
    // sim_ham < simhashPrefilter (text-scorable, media-dissimilar) used to
    // reach phase-2 scoring and now needs >= minTextBands shared TEXT bands
    // too. For true text near-dups (Jaccard >= 0.8) P(>= 2 of 32 bands) ~ 1,
    // so the labeled-corpus F1 gate (PipelineSpec) holds with the vote on.
    val pairs = normalPairs.unionByName(hotPairs)
      .groupBy(col("a"), col("b"))
      .agg(min(col("media_dist")).as("media_dist"), min(col("sim_ham")).as("sim_ham"),
        sum(when(col("is_text"), 1L).otherwise(0L)).as("n_text_bands"))
      .filter(col("media_dist") < cfg.mediaThreshold ||
        col("n_text_bands") >= cfg.minTextBands)
      .drop("n_text_bands")
    // caller invokes the cleanup thunk once `pairs` is materialized
    (pairs, stats0, () => { b.unpersist(); () })
  }
}
