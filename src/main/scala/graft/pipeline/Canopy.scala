package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canopy clustering (McCallum, Nigam & Ungar, KDD 2000): two-threshold
  * blocking with a CHEAP similarity, producing deliberately OVERLAPPING
  * groups inside which an expensive metric then runs. The graft's cheap
  * metric is the shared-MinHash-band count — the quantity the banded
  * blocking layer already computes for free — so canopies slot directly in
  * front of the levenshtein/Jaro-Winkler scorers as a coarser, recall-safe
  * alternative to single-threshold blocking (the reference has no
  * counterpart; its VP-tree radius search `vptree/vptree.go:126-157` plays
  * the per-query role that per-canopy scoring plays here).
  *
  * Sequential definition (candidate pool ordered by ascending doc id): the
  * smallest doc still in the pool becomes a canopy CENTER; every doc within
  * the LOOSE threshold T1 of it joins its canopy (whether or not already
  * removed — overlap is the point); docs within the TIGHT threshold T2
  * leave the pool; repeat until the pool is empty.
  *
  * Order-free distributed derivation: removal consults only tight edges,
  * so the center set is exactly the lexicographically-first maximal
  * independent set of the TIGHT graph ([[Components.lexFirstMis]] — the
  * same peel behind center clustering) plus every universe doc with no
  * tight edge (such docs are never removed, so each eventually becomes a
  * center). Membership then depends only on the center SET, not the pick
  * order: (c, v) for every loose edge incident to a center c, plus (c, c).
  *
  * Scale shape: the MIS peel runs on the tight EDGE relation (≪ corpus,
  * shrinking per round, localCheckpoint-truncated); membership is one
  * equi-join of the loose edges against the center set; the universe
  * completion is a single left-anti join. No per-canopy state ever
  * materializes on the driver.
  */
object Canopy {

  /** @param loose    (src, dst) doc-id pairs at the loose threshold T1 —
    *                 must be a superset of `tight` (canopy semantics:
    *                 anything tight-close is also loose-close)
    * @param tight    (src, dst) doc-id pairs at the tight threshold T2
    * @param universe single `doc_id` column — all docs; docs isolated in
    *                 the tight graph become centers (singleton canopies
    *                 unless loose edges attach members)
    * @return (canopy_id, doc_id) memberships — overlapping by design:
    *         a doc loose-adjacent to several centers appears once per
    *         canopy; every center carries its own (c, c) row
    */
  def canopies(loose: DataFrame, tight: DataFrame, universe: DataFrame,
               maxIterations: Int = 100, driverCutoff: Long = 200000)(
      implicit spark: SparkSession): DataFrame = {
    val normT = Components.normEdges(tight).localCheckpoint(true)
    // driver fast path: a node is its own center in the sequential greedy
    // exactly when it is in the lex-first MIS, so the center-clustering
    // driver greedy doubles as the MIS kernel (CanopySpec asserts the two
    // paths equal)
    val misCenters =
      if (normT.count() <= driverCutoff)
        Components.driverCenter(normT)
          .filter(col("doc_id") === col("center_id")).select(col("doc_id").as("c"))
      else Components.lexFirstMis(Components.symmetrize(normT), maxIterations)
    val tightNodes = normT.select(col("src").as("doc_id"))
      .union(normT.select(col("dst").as("doc_id"))).distinct()
    val centers = misCenters.select(col("c").as("canopy_id"))
      .union(universe.join(tightNodes, Seq("doc_id"), "left_anti")
        .select(col("doc_id").as("canopy_id")))
      .localCheckpoint(true)
    // membership edges include the tight set, so a tight edge a caller
    // failed to mirror into `loose` still lands its doc in the removing
    // center's canopy (T2 < T1 semantically ⇒ tight-close IS loose-close)
    // instead of silently dropping it from every canopy
    val members = Components.symmetrize(Components.normEdges(loose.union(tight)))
      .join(centers, col("u") === col("canopy_id"))
      .select(col("canopy_id"), col("v").as("doc_id"))
    centers.select(col("canopy_id"), col("canopy_id").as("doc_id"))
      .union(members)
      .distinct()
  }
}
