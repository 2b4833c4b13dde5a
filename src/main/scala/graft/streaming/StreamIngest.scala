package graft.streaming

import graft.media.{DefaultMedia, MediaResolver}
import graft.model.Doc
import graft.pipeline.{GraftConfig, Incremental, ParquetTableIO, Pipeline}
import graft.text.Hashing
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** Continuous entity resolution: fold every micro-batch of a document
  * stream into a clustered corpus maintained as immutable on-disk
  * generations — the streaming front door to [[Incremental]].
  *
  * Why `foreachBatch` and not a streaming join: each fold is a full batch
  * program (band linkage with a census, connected components, checkpoint
  * writes) — none of which exist as streaming operators. `foreachBatch`
  * is the idiomatic Spark shape for exactly this: the stream supplies
  * bounded batches and ordering; every batch runs the battle-tested batch
  * path unchanged, so streaming ingest inherits the batch fold's
  * byte-equality guarantee against a full re-run (IncrementalSpec /
  * StreamIngestSpec).
  *
  * State layout under `stateDir`:
  *   - `gen-NNNNNNNN/` — one immutable generation. A FULL generation (the
  *     [[seed]], and every `compactEvery`-th fold) carries the complete
  *     `signatures` + `bands` + `assignments` stage tables
  *     [[Pipeline.readState]]/`readBands` read. A DELTA generation carries
  *     only its batch's rows as `signatures_delta` + `bands_delta`
  *     (DIFFERENT stage names, so pointing `Pipeline.readState` at a delta
  *     dir fails loudly instead of returning a partial corpus), the FULL
  *     `assignments` table (tiny relative to signatures — two columns per
  *     doc, no text payloads), and a `PARENT` file naming the previous
  *     generation. A RETRACTION delta additionally carries a
  *     `tombstones_delta` stage: the ids whose ancestor rows are dead.
  *     Corpus state at a delta generation = fold the chain ROOT-FIRST,
  *     subtracting each delta's tombstones from the accumulated ancestors
  *     before unioning its own rows (so a tombstoned id re-inserted by a
  *     later fold survives).
  *   - `CURRENT` — the committed generation's name, flipped by an atomic
  *     rename AFTER the new generation is fully written. A crash mid-fold
  *     leaves `CURRENT` on the previous intact generation.
  *   - each generation carries a `MAXBATCH` marker — the folded-batch
  *     high-water mark, the replay criterion (folds set it to their
  *     batchId; retraction generations copy the parent's). Generation
  *     NUMBERS are allocated from the committed pointer and say nothing
  *     about batchIds: a retraction consumes a number without consuming
  *     a batchId, so takedowns interleave safely with a live stream.
  *
  * Delta generations are the append-only-commit shape an Iceberg-backed
  * TableIO would give for free: a fold WRITES O(batch) signature/band
  * rows, not O(corpus). Chains are bounded by compaction — every
  * `compactEvery`-th fold writes a full generation, so reads union at
  * most `compactEvery` parts and the amortized rewrite cost is
  * O(corpus / compactEvery) per fold.
  *
  * Exactly-once: Spark replays an uncommitted micro-batch with the SAME
  * batchId after a restart. The fold is deterministic and the next
  * generation dir is derived from the COMMITTED pointer (which a crash
  * leaves unmoved), so a replay overwrites the same uncommitted directory
  * and re-flips the pointer to the same value — idempotent (the
  * delta-vs-compact decision depends only on the committed chain, so a
  * replay makes the same choice). A batch at or below the folded
  * high-water mark (`MAXBATCH`) is skipped outright. Old generations are
  * kept for rollback/backfill; prune with
  * [[pruneGenerations]] (chain ancestors of the current generation are
  * never pruned).
  */
object StreamIngest {

  /** Seed `gen-00000000` from an initial corpus (full [[Pipeline.run]]
    * with its stage checkpoints) and commit the pointer. Call once before
    * starting the stream; an empty initial corpus is not supported (fold
    * needs a generation to link against — stream the first batch into a
    * tiny seeded corpus instead).
    */
  def seed(spark: SparkSession, initial: Dataset[Doc], stateDir: String,
           cfg: GraftConfig = GraftConfig(),
           resolver: MediaResolver = DefaultMedia): Unit = {
    val gen = genName(-1L)
    withStateLock(stateDir) {
      val res = Pipeline.run(spark, initial, cfg, resolver,
        checkpointDir = Some(s"$stateDir/$gen"))
      res.clusters.count()
      res.release()
      writeMaxBatch(s"$stateDir/$gen", -1L)
      commitPointer(stateDir, gen, None)
    }
  }

  /** The committed generation directory (absolute path). */
  def currentDir(stateDir: String): String = s"$stateDir/${currentGen(stateDir)}"

  /** Start the ingest: every micro-batch of `stream` folds into the
    * current generation and commits the next one. The default trigger is
    * fine — the fold is stateless at the STREAM level (all state lives in
    * the generation dirs), so none of the flatMapGroupsWithState trigger
    * caveats documented on [[StreamDedup]] apply.
    *
    * Lifecycle contract: `stateDir` and `streamingCheckpoint` are ONE
    * deployment — the replay guard compares batchIds against the state's folded high-water mark, and batchIds
    * are monotonic only within one streaming checkpoint. Starting a FRESH
    * streaming checkpoint against an existing stateDir restarts batchIds
    * at 0, at or below the state's folded high-water mark, so genuinely
    * new data would be skipped as replays. To feed new data from a new
    * stream into existing state, drive [[foldBatch]] directly with
    * batchIds past the high-water mark — it reads delta chains. ([[Incremental
    * .fromCheckpoint]] works only against a FULL generation dir — the
    * seed or a compaction — since a delta dir deliberately has no
    * `signatures` stage; read combined state with [[readCurrentState]].)
    */
  def start(stream: Dataset[Doc], stateDir: String,
            streamingCheckpoint: String, cfg: GraftConfig = GraftConfig(),
            resolver: MediaResolver = DefaultMedia,
            trigger: Option[Trigger] = None,
            compactEvery: Int = 8): StreamingQuery = {
    val w0 = writer(stream, stateDir, cfg, resolver, compactEvery)
      .option("checkpointLocation", streamingCheckpoint)
    trigger.fold(w0)(w0.trigger).start()
  }

  /** The configured `DataStreamWriter` (callers add trigger/checkpoint). */
  def writer(stream: Dataset[Doc], stateDir: String,
             cfg: GraftConfig = GraftConfig(),
             resolver: MediaResolver = DefaultMedia,
             compactEvery: Int = 8): DataStreamWriter[Doc] = {
    // fail at configuration time, not minutes later inside the first
    // micro-batch wrapped in a StreamingQueryException
    require(compactEvery >= 1, s"compactEvery must be >= 1, got $compactEvery")
    stream.writeStream.foreachBatch {
      (batch: Dataset[Doc], batchId: Long) =>
        foldBatch(batch.sparkSession, batch, batchId, stateDir, cfg, resolver,
          compactEvery)
    }
  }

  /** Corpus state at the committed generation — (signatures, assignments) —
    * the chain-aware analog of [[Pipeline.readState]]: the signature
    * relation is the union of the current chain's delta stages plus the
    * root's full stage; assignments are always full in every generation.
    */
  def readCurrentState(spark: SparkSession, stateDir: String)
      : (Dataset[graft.model.DocSig], org.apache.spark.sql.DataFrame) = {
    val cur = currentGen(stateDir)
    val (sigs, assign, _, _) = readChainParts(spark, stateDir, chainOf(stateDir, cur))
    (sigs, assign)
  }

  /** One micro-batch fold (also directly callable for batch-driven
    * backfills): read the committed generation's chain,
    * [[Incremental.run]] the batch against it, write generation
    * `batchId + 1` — a DELTA generation (O(batch) signature/band rows +
    * the full assignment table) unless the chain has reached
    * `compactEvery` parts, in which case a FULL generation is compacted
    * out (readable by [[Pipeline.readState]] / `fromCheckpoint` directly)
    * — and commit the pointer.
    */
  def foldBatch(spark: SparkSession, batch: Dataset[Doc], batchId: Long,
                stateDir: String, cfg: GraftConfig,
                resolver: MediaResolver = DefaultMedia,
                compactEvery: Int = 8): Unit = withStateLock(stateDir) {
    // 1 = compact every fold (the full-rewrite behavior); chains never
    // exceed compactEvery parts, which also bounds chainOf recursion
    require(compactEvery >= 1, s"compactEvery must be >= 1, got $compactEvery")
    val cur = currentGen(stateDir)
    // replay guard: against the folded-batch HIGH-WATER MARK carried by
    // every generation, NOT the generation number — retraction generations
    // consume generation numbers without consuming batchIds, so a live
    // stream's next micro-batch stays safe across an interleaved takedown
    if (batchId <= maxBatch(stateDir, cur)) {
      System.err.println(s"[graft] stream-ingest: batch $batchId already folded (at $cur) — skipping replay")
      return
    }
    val next = nextGen(cur)
    if (batch.isEmpty) return // no state change

    // corpus state = the chain's stages unioned, through the shared
    // widen + persist fold-input treatment; bands fall back to one
    // derivation only when some chain dir predates the bands stage
    val chain = chainOf(stateDir, cur)
    val (sigs0, assign, bands0, prevKey) = readChainParts(spark, stateDir, chain)
    val (sigs, bandsOpt, releaseInputs) = Incremental.foldInputs(spark, sigs0, bands0)
    // the finally releases every persisted relation on BOTH paths: a
    // thrown fold (bad batch, FS hiccup) fails the streaming query but
    // must not strand corpus-sized MEMORY_AND_DISK blocks in the
    // still-running driver's storage memory (unpersist is idempotent)
    var derivedBands: Option[org.apache.spark.sql.DataFrame] = None
    var inc: Incremental.IncrementalResult = null
    try {
      val oldBands = bandsOpt.getOrElse {
        val b = graft.pipeline.Blocking.bandRowsDF(sigs, cfg)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        b.count(); derivedBands = Some(b); b
      }
      inc = Incremental.run(spark, sigs, assign, batch, cfg, resolver,
        existingBands = Some(oldBands))

      // The batch side of the next generation is `inc.batchSigs` — the
      // exact-content REPRESENTATIVES the fold itself derived (one
      // derivation, persisted until release; same collapse rule as
      // Pipeline.run stage 0) — so streamed-in exact copies never accumulate
      // in corpus state. The generation key chains off the previous key so
      // the manifest lineage links the whole history.
      val genKey = Hashing.hash64(prevKey, batchId)
      val newAssign = Incremental.applyRemap(assign, inc.remapped)
        .unionByName(inc.assignments)
      val nextDir = s"$stateDir/$next"
      val batchBands = graft.pipeline.Blocking.bandRowsDF(inc.batchSigs, cfg)
      if (chain.length >= compactEvery) {
        // compaction: a self-contained full generation truncates the chain
        commitFullGeneration(spark, nextDir, sigs.unionByName(inc.batchSigs),
          newAssign, genKey, oldBands.unionByName(batchBands))
      } else {
        // delta generation: O(batch) signature/band rows (an EMPTY
        // tombstone set — folds only add) under DISTINCT stage names, plus
        // the full assignment table and the PARENT link
        commitDeltaGeneration(spark, nextDir, inc.batchSigs, batchBands,
          newAssign.select("doc_id").limit(0), newAssign, genKey, cur)
      }
      writeMaxBatch(nextDir, batchId)
      commitPointer(stateDir, next, Some(cur))
    } finally {
      if (inc != null) inc.release()
      derivedBands.foreach(_.unpersist())
      releaseInputs()
    }
  }

  /** Generation-level retraction — the takedown path beside the insert
    * stream: remove `removeIds` from the committed corpus state (via
    * [[Incremental.retract]], so only touched clusters are re-resolved)
    * and commit the result as the next generation. Retraction rewrites
    * state NON-monotonically — removed rows disappear and touched
    * survivors' signature rows may be re-keyed — so a retraction DELTA
    * carries a `tombstones_delta` stage (the drop ids) beside its
    * O(touched) signature/band delta rows: readers subtract each delta's
    * tombstones from its ANCESTORS before unioning its own rows. Like
    * folds, a retraction compacts to a FULL chain-truncating generation
    * once the chain reaches `compactEvery` parts — so an update-heavy CDC
    * stream pays O(touched) per batch, not a full corpus rewrite.
    *
    * Retractions take no batchId: the generation number is allocated from
    * the committed pointer, and the folded-batch high-water mark
    * ([[maxBatch]]) is carried through unchanged — so a takedown
    * interleaves safely with a LIVE insert stream. Crash-retry
    * is idempotent: the uncommitted dir and its keys are a pure function
    * of the committed state. A removal set with no id in the corpus
    * (including a re-run of an already-executed takedown) commits nothing
    * and logs.
    *
    * `docs` must cover the surviving members of touched clusters —
    * typically the consumer's own materialized corpus table, maintained
    * by the same loop (NOT an upstream source that may run ahead of the
    * applied stream); [[Incremental.retract]] fails loudly on gaps.
    * `StreamIngestSpec` interleaves folds and retractions and asserts the
    * final state byte-equals a full run over the surviving union.
    */
  def retractBatch(spark: SparkSession, docs: Dataset[Doc],
                   removeIds: org.apache.spark.sql.DataFrame,
                   stateDir: String, cfg: GraftConfig,
                   resolver: MediaResolver = DefaultMedia,
                   compactEvery: Int = 8): Unit = withStateLock(stateDir) {
    require(compactEvery >= 1, s"compactEvery must be >= 1, got $compactEvery")
    val cur = currentGen(stateDir)
    val next = nextGen(cur)
    if (removeIds.isEmpty) return

    val chain = chainOf(stateDir, cur)
    val (sigs0, assign, bands0, prevKey) = readChainParts(spark, stateDir, chain)
    val (sigs, bandsOpt, releaseInputs) = Incremental.foldInputs(spark, sigs0, bands0)

    // like foldBatch: the finally releases on success, failure, AND the
    // nothing-touched early return (whose non-local return also passes
    // through it) — a thrown takedown must not strand persisted state
    var res: Incremental.RetractResult = null
    try {
      res = Incremental.retract(spark, docs, assign, removeIds, cfg, resolver,
        existingSigs = Some(sigs))
      if (res.touched.isEmpty) { // nothing known was removed: state unchanged
        System.err.println(s"[graft] stream-ingest: retraction touched no cluster (at $cur) — nothing to commit")
        return
      }
      // tagged key derivation: a crashed FOLD attempt can leave stages in
      // the same uncommitted dir; the tag keeps a retraction's keys from
      // ever pairing with them
      val genKey = Hashing.hash64(Hashing.hash64(prevKey, 0x72657472616374L),
        genNum(next))
      val nextDir = s"$stateDir/$next"
      val memberBands = graft.pipeline.Blocking.bandRowsDF(res.memberSigs, cfg)
      if (chain.length >= compactEvery) {
        // compaction-style full generation, reusing the chain's band union
        val nextSigs = Incremental.applyRetractSigs(sigs, res)
        val nextBands = bandsOpt match {
          case Some(b) => b.join(res.dropIds, Seq("doc_id"), "left_anti")
            .unionByName(memberBands)
          case None => // some chain dir predates the bands stage — derive once
            graft.pipeline.Blocking.bandRowsDF(nextSigs, cfg)
        }
        commitFullGeneration(spark, nextDir, nextSigs,
          res.assignments, genKey, nextBands)
      } else {
        // retraction delta: O(touched) rows + the tombstoned drop ids
        commitDeltaGeneration(spark, nextDir, res.memberSigs, memberBands,
          res.dropIds, res.assignments, genKey, cur)
      }
      writeMaxBatch(nextDir, maxBatch(stateDir, cur)) // carried, not consumed
      commitPointer(stateDir, next, Some(cur))
    } finally {
      if (res != null) res.release()
      releaseInputs()
    }
  }

  /** Write + scrub a DELTA generation dir — ONE implementation for fold
    * and retraction deltas, so stage names, key derivations, the PARENT
    * link, and the stale-full-stage scrub cannot drift apart. Every delta
    * writes a `tombstones_delta` stage (folds write an EMPTY one): the
    * chain reader REQUIRES the stage on every delta, so a retraction
    * delta that lost its tombstones reads as corruption, never as a
    * harmless fold that silently resurrects retracted docs.
    */
  private def commitDeltaGeneration(spark: SparkSession, nextDir: String,
      sigs: Dataset[graft.model.DocSig], bands: org.apache.spark.sql.DataFrame,
      tombstones: org.apache.spark.sql.DataFrame,
      assign: org.apache.spark.sql.DataFrame, genKey: Long,
      parent: String): Unit = {
    import org.apache.spark.sql.functions.{col, struct}
    // a crashed earlier FULL-generation attempt could have left
    // 'signatures'/'bands' stages whose keys would PAIR with the fresh
    // assignments key and make readState succeed on a partial dir
    Seq("signatures", "bands").foreach(st =>
      deleteRecursively(java.nio.file.Paths.get(nextDir, st)))
    val io = new ParquetTableIO(nextDir)
    io.write("signatures_delta",
      sigs.toDF().select(struct(col("*")).as("sig")), genKey)
    io.write("bands_delta", bands, Hashing.hash64(genKey, 7L))
    io.write("tombstones_delta", tombstones.select("doc_id"),
      Hashing.hash64(genKey, 9L))
    io.write("assignments", assign.select("doc_id", "cluster_id"),
      Hashing.hash64(genKey, 5L))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(nextDir, "PARENT"), parent)
  }

  /** Write + scrub a FULL generation dir (compactions and retractions):
    * the complete stage tables, plus removal of any stale PARENT or delta
    * stages a crashed earlier attempt — e.g. under a different
    * `compactEvery` — could have left in the (uncommitted) dir, whose
    * deterministic manifest keys would otherwise pair with this write.
    */
  private def commitFullGeneration(spark: SparkSession, nextDir: String,
      sigs: Dataset[graft.model.DocSig], assign: org.apache.spark.sql.DataFrame,
      genKey: Long, bands: org.apache.spark.sql.DataFrame): Unit = {
    Incremental.writeState(spark, nextDir, sigs, assign, genKey,
      bands = Some(bands))
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(nextDir, "PARENT"))
    Seq("signatures_delta", "bands_delta", "tombstones_delta").foreach(st =>
      deleteRecursively(java.nio.file.Paths.get(nextDir, st)))
  }

  /** One CDC record: an upsert carries the full document; a delete needs
    * only the id (its spans are ignored). `seq` is the SOURCE order
    * (offset / LSN / commit timestamp) — when one micro-batch carries
    * several records for the same id, the highest `seq` wins (deletes win
    * ties), so insert-then-update folds only the final version and
    * create-then-delete resolves to absent regardless of Spark's row
    * order.
    */
  final case class CdcRecord(doc: Doc, delete: Boolean, seq: Long = 0L)

  /** The CDC front door: ONE stream carrying both upserts and deletes.
    * Per micro-batch, in order: (0) per-id last-wins reduction by `seq`;
    * (1) ids to retract = the batch's deletes ∪ the upsert ids ALREADY in
    * the corpus (an upsert of a live id is retract-then-insert — the fold
    * contract requires ids unique across old ∪ new, and this gives true
    * replace semantics for edited documents); (2) [[retractBatch]]
    * commits a (delta, usually) retraction generation when any of those
    * ids are live; (3) [[foldBatch]] folds the upsert docs and stamps the
    * high-water mark; a batch with nothing to fold advances the mark on
    * the committed generation afterwards (atomically). Replays are
    * idempotent end-to-end: a replayed prefix re-runs as no-ops (the
    * retracted ids are no longer live; the fold skips on the mark).
    *
    * `corpusDocs` must produce the corpus document table AS APPLIED so
    * far — typically the consumer's own materialized table, updated by
    * the same batch loop. An upstream source table that runs AHEAD of the
    * applied stream does not qualify: a source-side delete of a cluster
    * survivor would leave retraction's coverage check nothing to read
    * (it fails loudly rather than corrupting state). Deleting an id that
    * was never ingested is a no-op.
    */
  def cdcFoldBatch(spark: SparkSession, batch: Dataset[CdcRecord],
                   batchId: Long, corpusDocs: SparkSession => Dataset[Doc],
                   stateDir: String, cfg: GraftConfig,
                   resolver: MediaResolver = DefaultMedia,
                   compactEvery: Int = 8): Unit = withStateLock(stateDir) {
    // fail before the retraction commit, not between the two steps
    require(compactEvery >= 1, s"compactEvery must be >= 1, got $compactEvery")
    import spark.implicits._
    val cur = currentGen(stateDir)
    if (batchId <= maxBatch(stateDir, cur)) {
      System.err.println(s"[graft] stream-ingest: CDC batch $batchId already applied (at $cur) — skipping replay")
      return
    }
    // last-wins per id; persisted — the reduced batch feeds four
    // consumers (delete/upsert splits, the liveness join, the fold).
    // The order is TOTAL and independent of Spark's reduction order:
    // source seq, then delete-over-upsert, then a content digest — so
    // equal-seq conflicts (a producer that never sets seq) resolve the
    // same way on every replay, not by partition order
    def rank(r: CdcRecord): (Long, Int, Long) = (r.seq,
      if (r.delete) 1 else 0,
      Hashing.hash64(r.doc.spans.map(sp =>
        s"${sp.kind}|${sp.text}|${sp.media_ref}|${sp.offset}").mkString("\u0000")))
    val ord = Ordering[(Long, Int, Long)]
    val latest = batch.groupByKey(_.doc.doc_id)
      .reduceGroups((a: CdcRecord, b: CdcRecord) =>
        if (ord.compare(rank(a), rank(b)) >= 0) a else b)
      .map(_._2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    latest.count()
    val deletes = latest.filter((r: CdcRecord) => r.delete)
      .map(_.doc.doc_id).toDF("doc_id")
    val upserts = latest.filter((r: CdcRecord) => !r.delete).map(_.doc)
    val liveIds = new ParquetTableIO(s"$stateDir/$cur")
      .read(spark, "assignments").select("doc_id")
    val toRetract = deletes
      .union(liveIds.join(upserts.toDF().select("doc_id"), Seq("doc_id")))
      .distinct()
    try {
      retractBatch(spark, corpusDocs(spark), toRetract, stateDir, cfg, resolver,
        compactEvery)
      foldBatch(spark, upserts, batchId, stateDir, cfg, resolver, compactEvery)
      // foldBatch stamps the mark when it commits; for a batch with no
      // upserts to fold, advance it on the committed generation afterwards
      // (writeMaxBatch is atomic, so patching committed state is safe)
      if (maxBatch(stateDir, currentGen(stateDir)) < batchId)
        writeMaxBatch(currentDir(stateDir), batchId)
    } finally latest.unpersist()
    ()
  }

  /** The `DataStreamWriter` for a CDC stream (callers add
    * trigger/checkpoint and `.start()`): every micro-batch routes through
    * [[cdcFoldBatch]].
    */
  def cdcWriter(stream: Dataset[CdcRecord],
                corpusDocs: SparkSession => Dataset[Doc], stateDir: String,
                cfg: GraftConfig = GraftConfig(),
                resolver: MediaResolver = DefaultMedia,
                compactEvery: Int = 8): DataStreamWriter[CdcRecord] = {
    require(compactEvery >= 1, s"compactEvery must be >= 1, got $compactEvery")
    stream.writeStream.foreachBatch {
      (batch: Dataset[CdcRecord], batchId: Long) =>
        cdcFoldBatch(batch.sparkSession, batch, batchId, corpusDocs,
          stateDir, cfg, resolver, compactEvery)
    }
  }

  /** Generation chain, current-first, ending at the root full generation.
    * Tail-recursive: chain length is compactEvery-bounded in normal
    * operation, but the walk must not assume it.
    */
  private def chainOf(stateDir: String, gen: String): List[String] = {
    @annotation.tailrec
    def loop(g: String, acc: List[String], seen: Set[String]): List[String] = {
      if (seen(g)) // corrupted PARENT cycle: fail loudly, never spin
        throw new IllegalStateException(
          s"generation chain cycle at $g in $stateDir (PARENT links: ${acc.reverse.mkString(" -> ")})")
      val p = java.nio.file.Paths.get(stateDir, g, "PARENT")
      if (java.nio.file.Files.exists(p))
        loop(java.nio.file.Files.readString(p).trim, g :: acc, seen + g)
      else (g :: acc).reverse
    }
    loop(gen, Nil, Set.empty)
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      val paths = try walk.iterator().asScala.toSeq.reverse finally walk.close()
      paths.foreach(java.nio.file.Files.delete)
    }

  private def isDelta(stateDir: String, gen: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(stateDir, gen, "PARENT"))

  /** (sig state, head assignments, band state, head signature key) of a
    * chain. Each delta dir's stage keys are validated against the same
    * pairing rule [[Pipeline.readState]] enforces for full dirs, so a dir
    * mixing stages from different write attempts is rejected, not read.
    *
    * State is folded ROOT-FIRST: a delta's `tombstones_delta` ids (written
    * by retraction deltas) are subtracted from everything accumulated so
    * far — its ancestors — BEFORE the delta's own rows union in, so a
    * tombstoned id re-inserted by a LATER fold (the CDC replace path)
    * survives. Fold deltas carry no tombstones and reduce to the plain
    * union this always was.
    */
  private def readChainParts(spark: SparkSession, stateDir: String,
      chain: List[String])
      : (Dataset[graft.model.DocSig], org.apache.spark.sql.DataFrame,
         Option[org.apache.spark.sql.DataFrame], Long) = {
    val sigEnc = org.apache.spark.sql.Encoders.product[graft.model.DocSig]
    // (sigsDF, bands, key, headAssign, tombstones) per chain part
    val parts = chain.zipWithIndex.map { case (g, idx) =>
      val dir = s"$stateDir/$g"
      if (isDelta(stateDir, g)) {
        val io = new ParquetTableIO(dir)
        val k = io.completedKey("signatures_delta").getOrElse(
          throw new IllegalStateException(s"delta generation $dir lacks signatures_delta"))
        if (!io.completedKey("assignments").contains(Hashing.hash64(k, 5L)) ||
            !io.completedKey("bands_delta").contains(Hashing.hash64(k, 7L)))
          throw new IllegalStateException(
            s"delta generation $dir is not a consistent write (mixed stage keys)")
        val tombstones = io.completedKey("tombstones_delta") match {
          case Some(tk) if tk == Hashing.hash64(k, 9L) =>
            io.read(spark, "tombstones_delta")
          case other => throw new IllegalStateException(
            s"delta generation $dir lacks a consistent tombstones_delta stage (key=$other) — " +
              "a retraction delta that lost its tombstones must never be read as a fold")
        }
        // only the HEAD's assignments are consumed — skip the parquet
        // open (driver-side listing + footer reads of a corpus-sized
        // table) for the up-to-compactEvery non-head chain parts
        val assign =
          if (idx == 0) Some(io.read(spark, "assignments").select("doc_id", "cluster_id"))
          else None
        (io.read(spark, "signatures_delta").select("sig.*"),
          Some(io.read(spark, "bands_delta")), k, assign, Some(tombstones))
      } else {
        val (s, a) = Pipeline.readState(spark, dir)
        (s.toDF(), Pipeline.readBands(spark, dir),
          new ParquetTableIO(dir).completedKey("signatures").get, Some(a),
          Option.empty[org.apache.spark.sql.DataFrame])
      }
    }
    val ordered = parts.reverse // root-first
    val bandsAvailable = parts.forall(_._2.isDefined)
    var sigsAcc = ordered.head._1
    var bandsAcc = if (bandsAvailable) ordered.head._2 else None
    ordered.tail.foreach { p =>
      p._5.foreach { t =>
        sigsAcc = sigsAcc.join(t, Seq("doc_id"), "left_anti")
        bandsAcc = bandsAcc.map(_.join(t, Seq("doc_id"), "left_anti"))
      }
      sigsAcc = sigsAcc.unionByName(p._1)
      bandsAcc = bandsAcc.map(_.unionByName(p._2.get))
    }
    // head's assignments come from the validated per-part reader —
    // always full in every generation
    (sigsAcc.as[graft.model.DocSig](sigEnc), parts.head._4.get, bandsAcc,
      parts.head._3)
  }

  /** Delete generations no longer needed. Kept: the current generation's
    * chain (which reads require), the newest `keep` FULL generations
    * outside it (self-contained rollback points), and any delta whose
    * entire parent chain is itself kept (still a readable rollback
    * point). Pruned: everything else — in particular a delta whose chain
    * would lose a link, which without it cannot be read. Returns the
    * pruned dir names.
    */
  def pruneGenerations(stateDir: String, keep: Int = 2): Seq[String] = {
    val root = java.nio.file.Paths.get(stateDir)
    val cur = currentGen(stateDir)
    val chainSet = chainOf(stateDir, cur).toSet
    val listing = java.nio.file.Files.list(root)
    val gens =
      try listing.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.startsWith("gen-") && genNum(n) <= genNum(cur))
        .toSeq.sortBy(genNum)
      finally listing.close()
    val rollbackFulls = gens
      .filter(g => !chainSet(g) && !isDelta(stateDir, g))
      .takeRight(math.max(0, keep)).toSet
    // ascending pass: a delta additionally survives iff its parent
    // survived (parents have smaller ordinals, so one ordered pass
    // settles every chain) — such a delta's chain is intact and it
    // remains a READABLE rollback point; deltas that would lose a link
    // are pruned
    val kept = scala.collection.mutable.Set.empty[String]
    gens.foreach { g =>
      val intactDelta = isDelta(stateDir, g) && kept.contains(
        java.nio.file.Files.readString(
          java.nio.file.Paths.get(stateDir, g, "PARENT")).trim)
      if (chainSet(g) || rollbackFulls(g) || intactDelta) kept += g
    }
    val prune = gens.filterNot(kept)
    prune.foreach(g => deleteRecursively(root.resolve(g)))
    prune
  }

  private implicit class IterAsScala[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }

  private def genName(batchId: Long): String = f"gen-${batchId + 1}%08d"

  /** The next generation name, allocated from the COMMITTED pointer (not
    * from the batchId — retraction generations consume numbers without
    * consuming batchIds). A crashed uncommitted attempt retries into the
    * same dir because the pointer has not moved.
    */
  private def nextGen(cur: String): String = f"gen-${genNum(cur) + 1}%08d"

  /** Numeric generation ordinal — ALL ordering uses this, never the name:
    * the 8-digit padding keeps listings readable, but past 10^8 - 1 the
    * lexicographic order of the names diverges from the numeric order.
    */
  private def genNum(name: String): Long = name.stripPrefix("gen-").toLong

  /** The folded-batch high-water mark at `gen` — the replay criterion:
    * batchIds at or below it are already folded. Carried forward by every
    * write (folds set it to their batchId; retractions copy the parent's).
    * Generations from before the marker existed used gen number =
    * batchId + 1, so `genNum - 1` is the exact legacy equivalent.
    */
  private def maxBatch(stateDir: String, gen: String): Long = {
    val p = java.nio.file.Paths.get(stateDir, gen, "MAXBATCH")
    if (java.nio.file.Files.exists(p))
      java.nio.file.Files.readString(p).trim.toLong
    else genNum(gen) - 1
  }

  /** Atomic (tmp + rename) so a torn write can never leave a committed
    * generation with an unparsable mark that kills every future replay
    * check.
    */
  private def writeMaxBatch(genDir: String, value: Long): Unit = {
    val dir = java.nio.file.Paths.get(genDir)
    java.nio.file.Files.createDirectories(dir)
    val tmp = dir.resolve("MAXBATCH.tmp")
    java.nio.file.Files.writeString(tmp, value.toString)
    java.nio.file.Files.move(tmp, dir.resolve("MAXBATCH"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private def currentGen(stateDir: String): String = {
    val p = java.nio.file.Paths.get(stateDir, "CURRENT")
    if (!java.nio.file.Files.exists(p))
      throw new IllegalStateException(
        s"$stateDir has no CURRENT pointer — call StreamIngest.seed first")
    java.nio.file.Files.readString(p).trim
  }

  /** ONE writer per stateDir per JVM: foldBatch and retractBatch each
    * read CURRENT, write the next generation, and flip the pointer —
    * two interleaved writers would allocate the SAME next dir and one
    * would overwrite the other's committed generation (losing a batch
    * whose streaming offsets are already committed). The realistic
    * concurrent pair — the stream's foreachBatch thread and a driver
    * thread issuing a takedown — lives in one JVM, which this lock
    * serializes; cross-PROCESS writers are additionally caught (not
    * prevented) by [[commitPointer]]'s moved-pointer check.
    */
  private val stateLocks =
    scala.collection.concurrent.TrieMap.empty[String, Object]
  private def withStateLock[A](stateDir: String)(f: => A): A =
    stateLocks.getOrElseUpdate(
      java.nio.file.Paths.get(stateDir).toAbsolutePath.normalize.toString,
      new Object).synchronized(f)

  /** Flip the pointer — AFTER verifying it still reads `expectCur` (None
    * = must not exist yet, the seed case): a cross-process writer racing
    * this one fails loudly here instead of silently splicing its
    * generation out of the chain. Best-effort (check and move are not one
    * atomic step); same-JVM writers are fully serialized by
    * [[withStateLock]].
    */
  private def commitPointer(stateDir: String, gen: String,
                            expectCur: Option[String]): Unit = {
    val dir = java.nio.file.Paths.get(stateDir)
    java.nio.file.Files.createDirectories(dir)
    val cur = dir.resolve("CURRENT")
    val actual =
      if (java.nio.file.Files.exists(cur))
        Some(java.nio.file.Files.readString(cur).trim)
      else None
    if (actual != expectCur)
      throw new IllegalStateException(
        s"$stateDir CURRENT is ${actual.getOrElse("<none>")}, expected " +
          s"${expectCur.getOrElse("<none>")} while committing $gen — another " +
          "writer is active; state writers must be serialized per stateDir")
    val tmp = dir.resolve(s"CURRENT.tmp")
    java.nio.file.Files.writeString(tmp, gen)
    java.nio.file.Files.move(tmp, cur,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }
}
