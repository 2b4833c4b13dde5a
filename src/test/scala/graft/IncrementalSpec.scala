package graft

import graft.pipeline.{Incremental, Pipeline, Signatures}
import graft.synth.Corpus
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental-dedup gate: folding a new batch into an already clustered
  * corpus must produce EXACTLY the clusters of a full run over the union —
  * byte-equal ids, not equal-up-to-relabeling (cluster_id = global min
  * doc_id makes exact equality decidable).
  *
  * Split choice: old corpus = the perturbed duplicates, new batch = the base
  * docs. Two independent perturbations of one base are sometimes NOT direct
  * matches (connected only through the base), so the old run leaves them in
  * separate clusters and the new batch MUST merge old clusters — the spec
  * asserts the remap path actually fires rather than passing vacuously.
  */
class IncrementalSpec extends AnyFunSuite with SparkTestBase {

  private lazy val labeled = Corpus.generate(Corpus.Params(entities = 250, seed = 7))
  private lazy val oldSeq = labeled.filterNot(_.doc.doc_id.endsWith("-0")).map(_.doc)
  private lazy val newSeq = labeled.filter(_.doc.doc_id.endsWith("-0")).map(_.doc)
  private val cfg = Corpus.RecommendedConfig

  private def ds(docs: Seq[graft.model.Doc]) =
    spark.createDataset(docs)(org.apache.spark.sql.Encoders.product)

  /** Run the incremental protocol: cluster `old` fully, fold `new` in,
    * return (full-run truth, incremental result, #old clusters remapped).
    */
  private def protocol(oldDocs: Seq[graft.model.Doc], newDocs: Seq[graft.model.Doc])
      : (Map[String, String], Map[String, String], Long) = {
    val s = spark
    val full = Pipeline.run(s, ds(oldDocs ++ newDocs), cfg)
    val fullMap = full.clusters.select("doc_id", "cluster_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    full.release()

    val old = Pipeline.run(s, ds(oldDocs), cfg)
    val oldAssign = old.clusters.select("doc_id", "cluster_id")
      .localCheckpoint(true)
    old.release()
    val oldSigs = Signatures.derive(ds(oldDocs), cfg, graft.media.DefaultMedia)(s)
      .map(_.sig)(org.apache.spark.sql.Encoders.product)

    val inc = Incremental.run(s, oldSigs, oldAssign, ds(newDocs), cfg)
    val newAssign = inc.assignments.collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    val remap = inc.remapped.collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    inc.release()

    // apply the relabel map to the old assignment (broadcast-join shape in
    // production; a Map here)
    val oldFinal = oldAssign.collect().map { r =>
      val c = r.getString(1)
      (r.getString(0), remap.getOrElse(c, c))
    }.toMap
    (fullMap, oldFinal ++ newAssign, remap.size.toLong)
  }

  private lazy val outcome = protocol(oldSeq, newSeq)

  test("incremental result equals the full run over old ∪ new, exactly") {
    val (fullMap, incMap, _) = outcome
    assert(incMap.keySet == fullMap.keySet, "doc coverage differs")
    val diffs = fullMap.collect {
      case (id, c) if incMap(id) != c => (id, c, incMap(id))
    }
    assert(diffs.isEmpty, s"cluster mismatch for ${diffs.size} docs, e.g. ${diffs.take(5)}")
  }

  test("the batch actually merges old clusters (remap path exercised)") {
    val (_, _, nRemapped) = outcome
    info(s"old clusters remapped: $nRemapped")
    assert(nRemapped > 0, "split produced no old-cluster merges — the spec is vacuous")
  }

  test("batch with exact copies pre-collapses and still equals the full run") {
    // exact copies INSIDE the batch (id sorts after the original, so the
    // original stays representative) plus a copy of an OLD doc — the
    // former exercises the within-batch digest collapse, the latter the
    // fuzzy identical-content path across the boundary
    val inBatchBase = newSeq.head
    val oldBase = oldSeq.head
    val copies = (1 to 3).map(i =>
      graft.model.Doc(s"${inBatchBase.doc_id}x$i", inBatchBase.spans)) :+
      graft.model.Doc(s"${oldBase.doc_id}zcopy", oldBase.spans)
    val (fullMap, incMap, _) = protocol(oldSeq, newSeq ++ copies)
    assert(incMap.keySet == fullMap.keySet)
    val diffs = fullMap.collect {
      case (id, c) if incMap(id) != c => (id, c, incMap(id))
    }
    assert(diffs.isEmpty, s"cluster mismatch with copies: ${diffs.take(5)}")
    // the in-batch copies must cluster under their representative
    copies.dropRight(1).foreach { c =>
      assert(incMap(c.doc_id) == incMap(inBatchBase.doc_id),
        s"copy ${c.doc_id} not clustered with its representative")
    }
    // the cross-boundary copy must land in the old doc's cluster
    assert(incMap(s"${oldBase.doc_id}zcopy") == incMap(oldBase.doc_id),
      "cross-boundary exact copy not linked to the old doc's cluster")
  }

  test("fromCheckpoint folds a batch from a previous run's stage tables") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft-inc-ckpt").toString
    val old = Pipeline.run(s, ds(oldSeq), cfg, checkpointDir = Some(dir))
    old.clusters.count() // materialize the checkpointed stages
    old.release()

    val inc = Incremental.fromCheckpoint(s, dir, ds(newSeq), cfg)
    val (sigsReread, assignReread) = Pipeline.readState(s, dir)
    assert(sigsReread.count() == oldSeq.size && assignReread.count() == oldSeq.size)
    // next-generation state via the library helper (broadcast remap join)
    val nextState = Incremental.applyRemap(assignReread, inc.remapped)
      .unionByName(inc.assignments)
    val incMap = nextState.collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    inc.release()

    val full = Pipeline.run(s, ds(oldSeq ++ newSeq), cfg)
    val fullMap = full.clusters.select("doc_id", "cluster_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    full.release()
    assert(incMap == fullMap, "checkpoint-fed fold diverged from the full run")
  }
}
