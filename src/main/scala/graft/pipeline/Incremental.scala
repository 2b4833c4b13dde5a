package graft.pipeline

import graft.media.{DefaultMedia, MediaResolver}
import graft.model.{Doc, DocSig}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental dedup: fold a NEW batch of documents into an ALREADY
  * CLUSTERED corpus without re-scoring the old corpus against itself — the
  * only shape that works when the corpus is 10^12 docs and the daily batch
  * is 10^9. A full re-run touches O(corpus × bucket) pairs every day;
  * this touches O(batch × bucket).
  *
  * Correctness rests on supernode contraction: old-old duplicate edges are
  * already summarized by the old cluster assignment (same config ⇒ same
  * blocking + scoring would reproduce them), so each old CLUSTER becomes a
  * single node. The incremental graph is
  *
  *   nodes = new doc ids ∪ old cluster ids
  *   edges = (new×new is_dup pairs) ∪ (new doc → old cluster of matched old doc)
  *
  * and connected components over it equal the full-run components projected
  * onto this node set. Because cluster_id = min doc_id of a component and
  * an old cluster's id IS the min doc_id of its old members, the component
  * minimum over {new ids, old cluster ids} is the global minimum — so the
  * incremental ids equal the full-run ids EXACTLY, not just up to
  * relabeling (IncrementalSpec asserts byte-equality against a full run).
  *
  * Exactness caveat — census scope: hot/degenerate block decisions are
  * made per census (old run: old rows; this fold: batch and batch×corpus
  * rows), while a full run censuses the union. A key that crosses
  * `cfg.maxBlockSize` only in the union scope is dropped by the full run
  * but not here (and vice versa), so equality is guaranteed in the
  * regime where no key is degenerate at either scope — drops are always
  * logged loudly by both paths, never silent.
  *
  * Contract: `existingAssign` must be [[Pipeline.run]]'s full cluster
  * output (every old doc, singletons included) with the SAME `cfg`, and
  * doc_ids are unique across old ∪ new. At production scale
  * `existingSigs` is the checkpointed signature table from the previous
  * run (stage "signatures"), not a recomputation; under exact
  * pre-collapse that table holds one representative per content digest,
  * which is sufficient — an exact copy's signature is identical to its
  * representative's, so every cross match reachable via a copy is
  * reachable via the rep, and `existingAssign` already routes the rep's
  * cluster id.
  */
object Incremental {

  /** Fold a batch using the state a previous [[Pipeline.run]] checkpointed
    * to `checkpointDir` (signature + assignment stages via
    * [[Pipeline.readState]]) — the production entry point: yesterday's run
    * persisted its lineage, today's fold reads it instead of recomputing
    * anything over the old corpus.
    */
  def fromCheckpoint(spark: SparkSession, checkpointDir: String,
                     newDocs: Dataset[Doc], cfg: GraftConfig = GraftConfig(),
                     resolver: MediaResolver = DefaultMedia,
                     existingBands: Option[DataFrame] = None): IncrementalResult = {
    val (sigs, assign, bands, releaseState) =
      readFoldState(spark, checkpointDir, existingBands)
    val inner = run(spark, sigs, assign, newDocs, cfg, resolver, bands)
    inner.copy(release = () => { inner.release(); releaseState() })
  }

  /** A generation's fold inputs — (signatures, assignments, bands) — with
    * the fold-duration treatment applied to the parquet-backed relations
    * (shared by [[fromCheckpoint]] and `StreamIngest.foldBatch`):
    *
    * Both are persisted (each is consumed 2-3×: linkage census, cross-join
    * side, score side table) and their parallelism is restored first — a
    * modest checkpoint parquet yields far fewer splits than the session's
    * shuffle width (one ~150 MB sig table = 1-2 splits at the default
    * maxPartitionBytes), which strangles the cross-scoring join until its
    * first shuffle: measured 21 s vs 6 s for the same join at 102k docs.
    * At production scale the file count makes the repartition a no-op
    * (guarded), and the round-robin shuffle rides the one corpus scan the
    * fold pays anyway to materialize the cache. Caller-supplied
    * `existingBands` win over the checkpointed stage and are persisted the
    * same way. The returned thunk releases everything.
    */
  private[graft] def readFoldState(spark: SparkSession, checkpointDir: String,
      existingBands: Option[DataFrame] = None)
      : (Dataset[DocSig], DataFrame, Option[DataFrame], () => Unit) = {
    val (sigs0, assign) = Pipeline.readState(spark, checkpointDir)
    val (sigs, bands, release) = foldInputs(spark, sigs0,
      existingBands.orElse(Pipeline.readBands(spark, checkpointDir)))
    (sigs, assign, bands, release)
  }

  /** The widen + persist treatment alone, for callers that assemble the
    * relations themselves (e.g. `StreamIngest` unioning a delta-generation
    * chain): see [[readFoldState]] for why both steps matter.
    */
  private[graft] def foldInputs(spark: SparkSession, sigs0: Dataset[DocSig],
      bands0: Option[DataFrame])
      : (Dataset[DocSig], Option[DataFrame], () => Unit) = {
    val width = spark.sessionState.conf.numShufflePartitions
    def widen[T](ds: Dataset[T]): Dataset[T] =
      if (ds.rdd.getNumPartitions < width) ds.repartition(width) else ds
    val sigs = widen(sigs0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = bands0
      .map(b => widen(b).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    (sigs, bands,
      () => { sigs.unpersist(); bands.foreach(_.unpersist()); () })
  }

  final case class IncrementalResult(
      assignments: DataFrame, // (doc_id, cluster_id) for every NEW doc
      remapped: DataFrame, // (old_cluster_id, cluster_id): old clusters whose id changed
      batchSigs: Dataset[DocSig], // signatures of the batch's exact-content
      // REPRESENTATIVES (the rows a generation's signature stage carries —
      // same collapse rule as Pipeline.run stage 0); persisted until
      // `release`, so generation writers can reuse them without re-deriving
      release: () => Unit)

  /** Persist a folded generation as the stage tables [[fromCheckpoint]] /
    * [[Pipeline.readState]] read — closing the multi-day loop: day N's
    * fold writes a NEW generation dir (generations are immutable; the
    * previous dir stays a valid fold source), day N+1 folds from it
    * without ever re-running the full pipeline.
    *
    *   - `sigs`: previous generation's signatures ∪ the batch's (derive
    *     the batch side with [[Signatures.derive]], or re-read it from
    *     this fold's own stages)
    *   - `assignments`: `applyRemap(oldAssign, result.remapped)
    *     unionByName result.assignments`
    *   - `generationKey`: any value unique per generation, e.g.
    *     `Hashing.hash64(previousKey, batchDigest)` — the manifest pair is
    *     written with the same key derivation [[Pipeline.run]] uses, so
    *     [[Pipeline.readState]]'s consistency check accepts it.
    */
  def writeState(spark: SparkSession, checkpointDir: String,
                 sigs: Dataset[DocSig], assignments: DataFrame,
                 generationKey: Long,
                 bands: Option[DataFrame] = None): Unit = {
    val io = new ParquetTableIO(checkpointDir)
    io.write("signatures",
      sigs.toDF().select(org.apache.spark.sql.functions.struct(col("*")).as("sig")),
      generationKey)
    // optional bands stage (old ∪ batch band rows, [[Blocking.bandRowsDF]]
    // schema): lets the NEXT fold skip the O(corpus) key re-derivation —
    // written before assignments, the generation's commit marker
    bands.foreach(b => io.write("bands", b,
      graft.text.Hashing.hash64(generationKey, 7L)))
    io.write("assignments", assignments.select("doc_id", "cluster_id"),
      graft.text.Hashing.hash64(generationKey, 5L))
  }

  /** The old assignment table with the relabel map applied — a broadcast
    * join (the remap covers only TOUCHED clusters, a batch-sized relation).
    * `applyRemap(oldAssign, inc.remapped) union inc.assignments` is the
    * next generation's full assignment state, ready to checkpoint.
    */
  def applyRemap(existingAssign: DataFrame, remapped: DataFrame): DataFrame =
    existingAssign.join(
        org.apache.spark.sql.functions.broadcast(remapped),
        existingAssign("cluster_id") === remapped("old_cluster_id"), "left")
      .select(existingAssign("doc_id"),
        coalesce(remapped("cluster_id"), existingAssign("cluster_id")).as("cluster_id"))

  /** `existingBands`: optionally the old corpus's prebuilt band relation
    * ([[Blocking.bandRowsDF]] schema, checkpointed by the previous run).
    * Without it the fold re-derives old band keys — an O(corpus) UDF pass
    * the production shape avoids (measured by `DiagIncremental`, recorded
    * in BASELINE.md).
    */
  def run(spark: SparkSession, existingSigs: Dataset[DocSig],
          existingAssign: DataFrame, newDocs: Dataset[Doc],
          cfg: GraftConfig = GraftConfig(),
          resolver: MediaResolver = DefaultMedia,
          existingBands: Option[DataFrame] = None): IncrementalResult = {
    implicit val s: SparkSession = spark
    import spark.implicits._

    // 0. within-batch exact pre-collapse — same digest rule as Pipeline
    // stage 0 (md5 over the canonical span JSON), same reason: a k-copy
    // farm inside the batch must cost O(k), not the O(k²) within-block
    // pairs identical content generates. Copies inherit their
    // representative's cluster at expansion. (Exact copies STRADDLING the
    // old/new boundary are linked by the fuzzy path instead — identical
    // content shares every band and scores 1.0 — so they need no digest
    // join against the old corpus; the one uncovered case is a new doc
    // whose content is band-less (no text, no media) AND identical to an
    // old doc, which a full run would merge by digest.)
    val tRun = System.nanoTime()
    def mark(label: String): Unit =
      System.err.println(f"[graft] incremental $label: ${(System.nanoTime() - tRun) / 1e9}%.2f s elapsed")
    // Run on the FAILURE path only — on success, ownership of every
    // persisted relation transfers to the result's release thunk. A fold
    // lives inside a long-running streaming driver: a thrown stage (bad
    // batch, FS hiccup) must not strand MEMORY_AND_DISK blocks for the
    // life of the session. Every registered thunk is an idempotent
    // unpersist, so the registry never double-frees anything live.
    val onFailure = scala.collection.mutable.ArrayBuffer.empty[() => Unit]
    def guarded[A](body: => A): A =
      try body
      catch {
        case e: Throwable =>
          onFailure.reverseIterator.foreach(c =>
            try c() catch { case _: Throwable => () })
          throw e
      }
    guarded {
    val (batchDocs, expansion) =
      if (cfg.exactPrecollapse) Pipeline.precollapse(newDocs) else (newDocs, None)
    expansion.foreach(e => onFailure += (() => { e.unpersist(); () }))
    mark("precollapse")

    val newSigs = Signatures.derive(batchDocs, cfg, resolver).map(_.sig)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    onFailure += (() => { newSigs.unpersist(); () })

    // new×new: the standard self-join pipeline on the batch alone. The
    // edge set is materialized BEFORE the block relation is released —
    // candidatePairs' persist contract — or the band udf would re-run for
    // both self-join legs when CC later forces the edges.
    val (cands, _, releaseBlocks) = Blocking.candidatePairs(newSigs, cfg)
    onFailure += releaseBlocks
    val newEdges = Pairs.edges(Pairs.score(cands, newSigs, cfg))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    onFailure += (() => { newEdges.unpersist(); () })
    newEdges.count()
    releaseBlocks()
    mark("new-new edges")

    // new×old: bipartite band linkage — old-old pairs never exist in any plan
    val cross = Linkage.linkSigs(spark, newSigs, existingSigs, cfg, existingBands)
    onFailure += (() => cross.release())

    // contract matched old docs to their cluster supernode. The assignment
    // join is id-keyed and touches only matched old docs; distinct caps the
    // edge count at (new doc, old cluster) granularity. MATERIALIZED before
    // CC — connected components forces its edge relation more than once
    // (size gate + iterations), and an unmaterialized crossEdges re-runs
    // the whole cross-scoring join each time (measured: the components
    // stage of a parquet-backed fold fell from 17.8 s to the in-memory
    // legs' ~5 s once the edges were persisted; newEdges already was).
    val crossEdges = cross.matches
      .join(existingAssign.withColumnRenamed("doc_id", "right_id"), Seq("right_id"))
      .select(col("left_id").as("src"), col("cluster_id").as("dst"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    onFailure += (() => { crossEdges.unpersist(); () })
    crossEdges.count()

    mark("cross link built")
    val comp = Components.connectedComponents(
      newEdges.unionByName(crossEdges), cfg.maxCcIterations)
    mark("components")

    // new docs: component id, or themselves when untouched by any edge;
    // with pre-collapse every copy routes through its representative
    // (the same expansion rule as Pipeline stage 6 — shared helper)
    val assignments = Pipeline.expandClusters(
      newDocs.toDF().select(col("doc_id")), expansion, comp)
      .select("doc_id", "cluster_id")

    // old clusters absorbed under a smaller id (a new doc bridged them to an
    // earlier cluster or doc): emit the relabel map — the caller applies it
    // to the old assignment table as a broadcast join over TOUCHED clusters
    val remapped = comp
      .join(existingAssign.select(col("cluster_id").as("doc_id")).distinct(), Seq("doc_id"))
      .filter(col("cluster_id") =!= col("doc_id"))
      .select(col("doc_id").as("old_cluster_id"), col("cluster_id"))

    IncrementalResult(assignments, remapped, newSigs,
      () => {
        cross.release(); newSigs.unpersist(); newEdges.unpersist()
        crossEdges.unpersist(); expansion.foreach(_.unpersist()); ()
      })
    }
  }

  final case class RetractResult(
      assignments: DataFrame, // (doc_id, cluster_id) — the FULL remaining corpus
      reassigned: DataFrame, // (doc_id, cluster_id) — touched-cluster members only
      touched: DataFrame, // (cluster_id): clusters that lost at least one doc
      removed: DataFrame, // (doc_id) — the resolved removal set
      memberIds: DataFrame, // (doc_id) — every surviving member of a touched cluster
      memberSigs: Dataset[DocSig], // content-rep signatures of those survivors
      release: () => Unit) {
    /** removed ∪ surviving touched members — the ids whose OLD state rows
      * (signatures, bands) must not survive into the next generation (the
      * survivors' replacements come from [[memberSigs]]). One definition,
      * shared by [[Incremental.applyRetractSigs]] and the band splice in
      * `StreamIngest.retractBatch`.
      */
    def dropIds: DataFrame =
      removed.select("doc_id").unionByName(memberIds.select("doc_id"))
  }

  /** The signature stage of the POST-retraction generation: rows for
    * removed docs and for touched survivors are dropped, and the touched
    * survivors' representative rows (possibly re-keyed by the local
    * pre-collapse when a removed rep's copy was promoted) take their place.
    * Pair with [[writeState]] — `writeState(dir, applyRetractSigs(oldSigs,
    * res), res.assignments, key)` persists the retracted corpus as a
    * generation [[fromCheckpoint]] folds tomorrow's batch into, closing the
    * insert+delete production loop (`RetractSpec` asserts the composed
    * result byte-equals a full run). Call before `res.release()`.
    */
  def applyRetractSigs(oldSigs: Dataset[DocSig], res: RetractResult): Dataset[DocSig] = {
    import res.memberSigs.sparkSession.implicits._
    oldSigs.toDF().join(res.dropIds, Seq("doc_id"), "left_anti")
      .unionByName(res.memberSigs.toDF()).as[DocSig]
  }

  /** Retract (delete) documents from an ALREADY CLUSTERED corpus without a
    * full re-run — the DELETE leg of the incremental lifecycle (takedowns,
    * opt-outs, TTL expiry). The hard case is a removed BRIDGE doc: the rest
    * of its cluster may fall apart into several components, so unlike a
    * fold this cannot be edge-monotone — touched clusters are re-resolved
    * from scratch. The work is bounded by the touched clusters, never the
    * corpus:
    *
    *   touched = clusters containing a removed doc        (≤ |removal|)
    *   members = surviving docs of touched clusters       (Σ their sizes)
    *   re-run  = block → score → CC restricted to members (O(members × bucket))
    *
    * Exactness vs a full re-run over the remaining corpus: every pair is
    * decided by the same deterministic kernel, so (a) pairs inside an
    * untouched cluster keep their old decision, (b) pairs incident to an
    * untouched cluster were non-duplicates before and are unaffected by
    * deletions elsewhere, and (c) pairs among members are re-decided here
    * identically — including cross-old-cluster member pairs that enter band
    * candidacy and re-score to the same non-dup verdict. Cluster ids are
    * component minima in both runs, so the ids match EXACTLY, including
    * relabels when a cluster's min-id member was removed (`RetractSpec`
    * asserts byte-equality against the full re-run). The fold's
    * census-scope caveat (hot/degenerate keys judged on a smaller scope)
    * applies unchanged.
    *
    * `docs` must cover at least the surviving members of touched clusters —
    * in production the corpus table itself; the lookup is an id-keyed
    * semi-join, so only touched rows are ever read. Removing an id the
    * assignment does not know is a no-op. When `existingSigs` (the
    * checkpointed signature stage) is supplied, member signatures are
    * REUSED, and only members without a persisted row — exact copies whose
    * representative was removed, now promoted to representative — pay a
    * fresh derivation (decode + hash); derivation is deterministic, so the
    * reuse is value-neutral.
    */
  def retract(spark: SparkSession, docs: Dataset[Doc],
              existingAssign: DataFrame, removeIds: DataFrame,
              cfg: GraftConfig = GraftConfig(),
              resolver: MediaResolver = DefaultMedia,
              existingSigs: Option[Dataset[DocSig]] = None): RetractResult = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // failure-path cleanup registry — see [[run]]: a thrown takedown in a
    // long-running driver must not strand persisted relations; thunks are
    // idempotent unpersists, success transfers ownership to the result
    val onFailure = scala.collection.mutable.ArrayBuffer.empty[() => Unit]
    def guarded[A](body: => A): A =
      try body
      catch {
        case e: Throwable =>
          onFailure.reverseIterator.foreach(c =>
            try c() catch { case _: Throwable => () })
          throw e
      }
    guarded {
    val rm = removeIds.select("doc_id").distinct().persist(mem)
    onFailure += (() => { rm.unpersist(); () })
    val touched = existingAssign.join(rm, Seq("doc_id"))
      .select("cluster_id").distinct().persist(mem)
    onFailure += (() => { touched.unpersist(); () })
    if (touched.count() == 0) {
      // nothing known was removed (e.g. a re-run of an already executed
      // takedown): the state is unchanged — short-circuit BEFORE any
      // member gathering, signature work, or empty-relation pipeline jobs
      RetractResult(
        existingAssign.select("doc_id", "cluster_id"),
        existingAssign.select("doc_id", "cluster_id").limit(0),
        touched, rm, rm.select("doc_id").limit(0),
        spark.emptyDataset[DocSig],
        () => { rm.unpersist(); touched.unpersist(); () })
    } else {

    // surviving members of touched clusters; the broadcast is justified —
    // `touched` is bounded by the removal batch, not the corpus
    val memberIds = existingAssign.join(broadcast(touched), Seq("cluster_id"))
      .join(rm, Seq("doc_id"), "left_anti").select("doc_id")
    val memberDocs = docs.join(memberIds, Seq("doc_id"), "left_semi").as[Doc]
      .persist(mem)
    onFailure += (() => { memberDocs.unpersist(); () })
    // coverage is a hard precondition, not a best effort: a survivor the
    // doc table does not cover would silently VANISH from the output
    // assignment while its stale signature row survived — exactly the
    // sig/assignment inconsistency the generation readers exist to prevent.
    // Checked by anti-join emptiness (NOT row counts, which duplicate
    // doc_ids in `docs` could silently defeat in both directions).
    val uncovered = memberIds
      .join(docs.toDF().select("doc_id"), Seq("doc_id"), "left_anti")
    if (!uncovered.isEmpty) {
      val sample = uncovered.take(5).map(_.getString(0)).mkString(", ")
      throw new IllegalArgumentException( // guarded releases rm/touched/memberDocs
        "retract: docs does not cover every surviving member of the " +
          s"touched clusters (e.g. $sample) — an incomplete doc table " +
          "would silently drop the uncovered survivors from the corpus state")
    }

    // the same stage composition as Pipeline.run, restricted to members
    val (repDocs, expansion) =
      if (cfg.exactPrecollapse) Pipeline.precollapse(memberDocs)
      else (memberDocs, None)
    expansion.foreach(e => onFailure += (() => { e.unpersist(); () }))
    val repSigs = (existingSigs match {
      case Some(old) =>
        val oldDf = old.toDF()
        val reused = oldDf.join(repDocs.select("doc_id"), Seq("doc_id"), "left_semi")
        val fresh = repDocs.join(oldDf.select("doc_id"), Seq("doc_id"), "left_anti").as[Doc]
        reused.unionByName(Signatures.derive(fresh, cfg, resolver).map(_.sig).toDF())
          .as[DocSig]
      case None => Signatures.derive(repDocs, cfg, resolver).map(_.sig)
    }).persist(mem)
    onFailure += (() => { repSigs.unpersist(); () })

    val (cands, _, releaseBlocks) = Blocking.candidatePairs(repSigs, cfg)
    onFailure += releaseBlocks
    val edges = Pairs.edges(Pairs.score(cands, repSigs, cfg)).persist(mem)
    onFailure += (() => { edges.unpersist(); () })
    edges.count()
    releaseBlocks()
    val comp = Components.connectedComponents(edges, cfg.maxCcIterations)

    val reassigned = Pipeline.expandClusters(
        memberDocs.toDF().select(col("doc_id")), expansion, comp)
      .select("doc_id", "cluster_id")
    val untouchedRows = existingAssign
      .join(broadcast(touched), Seq("cluster_id"), "left_anti")
      .select("doc_id", "cluster_id")
    RetractResult(untouchedRows.unionByName(reassigned), reassigned, touched,
      rm, memberDocs.toDF().select("doc_id"), repSigs,
      () => {
        rm.unpersist(); touched.unpersist(); memberDocs.unpersist()
        repSigs.unpersist(); edges.unpersist()
        expansion.foreach(_.unpersist()); ()
      })
    }
    }
  }
}
