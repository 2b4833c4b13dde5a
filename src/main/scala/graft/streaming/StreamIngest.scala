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
  *   - `gen-NNNNNNNN/` — one immutable generation (the `signatures` +
  *     `assignments` stage tables [[Pipeline.readState]] reads, written by
  *     [[Incremental.writeState]]); `gen-00000000` is the [[seed]].
  *   - `CURRENT` — the committed generation's name, flipped by an atomic
  *     rename AFTER the new generation is fully written. A crash mid-fold
  *     leaves `CURRENT` on the previous intact generation.
  *
  * Exactly-once: Spark replays an uncommitted micro-batch with the SAME
  * batchId after a restart. The fold is deterministic and generation
  * `gen-(batchId+1)` is derived from the batchId, so a replay overwrites
  * the same (uncommitted) directory and re-flips the pointer to the same
  * value — idempotent. A batch whose generation is already committed
  * (pointer at or past it) is skipped outright.
  *
  * Scale note: each generation rewrites the full signature table —
  * O(corpus) of compact signature rows per fold, the honest cost of
  * immutable-Parquet generations (the fold COMPUTE stays O(batch ×
  * bucket); see Incremental). A table format with appendable commits
  * (Iceberg — no runtime jar in this sandbox, see TableIO) would commit
  * only the batch delta. Old generations are kept for rollback/backfill;
  * prune with [[pruneGenerations]].
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
    val res = Pipeline.run(spark, initial, cfg, resolver,
      checkpointDir = Some(s"$stateDir/$gen"))
    res.clusters.count()
    res.release()
    commitPointer(stateDir, gen)
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
    * deployment — the replay guard maps batchId → generation, and batchIds
    * are monotonic only within one streaming checkpoint. Starting a FRESH
    * streaming checkpoint against an existing stateDir restarts batchIds
    * at 0, whose generations are already committed, so genuinely new data
    * would be skipped as replays. To feed new data from a new stream into
    * existing state, drive [[foldBatch]] directly with batchIds past the
    * committed generation (or batch-fold via [[Incremental.fromCheckpoint]]
    * + [[Incremental.writeState]]).
    */
  def start(stream: Dataset[Doc], stateDir: String,
            streamingCheckpoint: String, cfg: GraftConfig = GraftConfig(),
            resolver: MediaResolver = DefaultMedia,
            trigger: Option[Trigger] = None): StreamingQuery = {
    val w0 = writer(stream, stateDir, cfg, resolver)
      .option("checkpointLocation", streamingCheckpoint)
    trigger.fold(w0)(w0.trigger).start()
  }

  /** The configured `DataStreamWriter` (callers add trigger/checkpoint). */
  def writer(stream: Dataset[Doc], stateDir: String,
             cfg: GraftConfig = GraftConfig(),
             resolver: MediaResolver = DefaultMedia): DataStreamWriter[Doc] =
    stream.writeStream.foreachBatch {
      (batch: Dataset[Doc], batchId: Long) =>
        foldBatch(batch.sparkSession, batch, batchId, stateDir, cfg, resolver)
    }

  /** One micro-batch fold (also directly callable for batch-driven
    * backfills): read the committed generation, [[Incremental.run]] the
    * batch against it, write generation `batchId + 1`, commit the pointer.
    */
  def foldBatch(spark: SparkSession, batch: Dataset[Doc], batchId: Long,
                stateDir: String, cfg: GraftConfig,
                resolver: MediaResolver = DefaultMedia): Unit = {
    val next = genName(batchId)
    val cur = currentGen(stateDir)
    if (genNum(cur) >= genNum(next)) { // NUMERIC compare — names are padded
      // for readable listings, but gen-100000000 would sort lexicographically
      // before gen-99999999, so ordering must never rely on the string
      System.err.println(s"[graft] stream-ingest: batch $batchId already committed ($cur) — skipping replay")
      return
    }
    if (batch.isEmpty) return // no state change; gen numbering has gaps, by design
    val curDir = s"$stateDir/$cur"
    val prevKey = new ParquetTableIO(curDir).completedKey("signatures")
      .getOrElse(throw new IllegalStateException(s"no signature manifest in $curDir"))

    // generation state through the shared fold-input path: persisted for
    // the fold + both state writes, parallelism restored, checkpointed
    // bands preferred (one band re-derivation only for a pre-bands
    // generation — materialized here so its 3+ consumers share it)
    val (sigs, assign, bandsOpt, releaseState) =
      Incremental.readFoldState(spark, curDir)
    val oldBands = bandsOpt.getOrElse {
      val b = graft.pipeline.Blocking.bandRowsDF(sigs, cfg)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      b.count(); b
    }
    val inc = Incremental.run(spark, sigs, assign, batch, cfg, resolver,
      existingBands = Some(oldBands))

    // next generation = old sigs ∪ batch rep sigs, old assignments
    // (remapped) ∪ batch assignments, old ∪ batch bands. The batch side of
    // the signature stage is `inc.batchSigs` — the exact-content
    // REPRESENTATIVES the fold itself derived (one derivation, persisted
    // until release; same collapse rule as Pipeline.run stage 0) — so
    // streamed-in exact copies never accumulate in corpus state: a k-copy
    // farm would otherwise fan every later fold's band join k-fold and
    // skew the linkage census away from what a full run censuses. The
    // generation key chains off the previous key so readState's
    // consistency check links the whole lineage.
    Incremental.writeState(spark, s"$stateDir/$next",
      sigs.unionByName(inc.batchSigs),
      Incremental.applyRemap(assign, inc.remapped).unionByName(inc.assignments),
      generationKey = Hashing.hash64(prevKey, batchId),
      bands = Some(oldBands.unionByName(
        graft.pipeline.Blocking.bandRowsDF(inc.batchSigs, cfg))))
    inc.release()
    if (bandsOpt.isEmpty) oldBands.unpersist()
    releaseState()
    commitPointer(stateDir, next)
  }

  /** Delete committed generations older than the newest `keep` (the
    * current generation is never deleted). Returns the pruned dir names.
    */
  def pruneGenerations(stateDir: String, keep: Int = 2): Seq[String] = {
    val root = java.nio.file.Paths.get(stateDir)
    val cur = currentGen(stateDir)
    val listing = java.nio.file.Files.list(root)
    val gens =
      try listing.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.startsWith("gen-") && genNum(n) <= genNum(cur))
        .toSeq.sortBy(genNum)
      finally listing.close()
    val prune = gens.dropRight(math.max(1, keep))
    prune.foreach { g =>
      val walk = java.nio.file.Files.walk(root.resolve(g))
      val paths = try walk.iterator().asScala.toSeq.reverse finally walk.close()
      paths.foreach(java.nio.file.Files.delete)
    }
    prune
  }

  private implicit class IterAsScala[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }

  private def genName(batchId: Long): String = f"gen-${batchId + 1}%08d"

  /** Numeric generation ordinal — ALL ordering uses this, never the name:
    * the 8-digit padding keeps listings readable, but past 10^8 - 1 the
    * lexicographic order of the names diverges from the numeric order.
    */
  private def genNum(name: String): Long = name.stripPrefix("gen-").toLong

  private def currentGen(stateDir: String): String = {
    val p = java.nio.file.Paths.get(stateDir, "CURRENT")
    if (!java.nio.file.Files.exists(p))
      throw new IllegalStateException(
        s"$stateDir has no CURRENT pointer — call StreamIngest.seed first")
    java.nio.file.Files.readString(p).trim
  }

  private def commitPointer(stateDir: String, gen: String): Unit = {
    val dir = java.nio.file.Paths.get(stateDir)
    java.nio.file.Files.createDirectories(dir)
    val tmp = dir.resolve(s"CURRENT.tmp")
    java.nio.file.Files.writeString(tmp, gen)
    java.nio.file.Files.move(tmp, dir.resolve("CURRENT"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }
}
