package graft.streaming

import graft.media.{DefaultMedia, MediaResolver}
import graft.model.Doc
import graft.pipeline.{GraftConfig, Incremental, ParquetTableIO, Pipeline, Signatures}
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

  private def sigEnc = org.apache.spark.sql.Encoders.product[graft.model.DocSig]

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
    if (cur >= next) { // zero-padded names: lexicographic = numeric
      System.err.println(s"[graft] stream-ingest: batch $batchId already committed ($cur) — skipping replay")
      return
    }
    if (batch.isEmpty) return // no state change; gen numbering has gaps, by design
    val curDir = s"$stateDir/$cur"
    val (sigs, assign) = Pipeline.readState(spark, curDir)
    val prevKey = new ParquetTableIO(curDir).completedKey("signatures")
      .getOrElse(throw new IllegalStateException(s"no signature manifest in $curDir"))

    // the corpus band relation rides generation to generation: read the
    // previous generation's checkpointed bands (falling back to one key
    // re-derivation for pre-bands generations), fold against them, and
    // write old ∪ batch bands into the next generation — so no fold after
    // the first ever pays the O(corpus) key derivation again
    val oldBands = Pipeline.readBands(spark, curDir)
      .getOrElse(graft.pipeline.Blocking.bandRowsDF(sigs, cfg))
    val inc = Incremental.run(spark, sigs, assign, batch, cfg, resolver,
      existingBands = Some(oldBands))
    // next generation = old sigs ∪ batch sigs, old assignments (remapped)
    // ∪ batch assignments; the generation key chains off the previous key
    // so readState's consistency check links the whole lineage
    val batchSigs = Signatures.derive(batch, cfg, resolver)(spark).map(_.sig)(sigEnc)
    Incremental.writeState(spark, s"$stateDir/$next",
      sigs.unionByName(batchSigs),
      Incremental.applyRemap(assign, inc.remapped).unionByName(inc.assignments),
      generationKey = Hashing.hash64(prevKey, batchId),
      bands = Some(oldBands.unionByName(
        graft.pipeline.Blocking.bandRowsDF(batchSigs, cfg))))
    inc.release()
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
        .filter(n => n.startsWith("gen-") && n <= cur).toSeq.sorted
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
