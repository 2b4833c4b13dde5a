package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative match-merge entity resolution (the R-Swoosh family —
  * Benjelloun et al., "Swoosh: a generic approach to entity resolution",
  * VLDB Journal 2009), distributed as a fixpoint of whole-corpus rounds
  * rather than the paper's sequential record-at-a-time loop.
  *
  * The semantics one-shot pairwise matching + transitive closure cannot
  * express: after records merge, the MERGED profile (here: the union of
  * the members' token sets) re-enters matching, so evidence accumulated
  * across a merge can match records that no pairwise base comparison
  * matched (SwooshSpec constructs the canonical witness: Jac(A,B) ≥ t,
  * Jac(A,C) < t, Jac(B,C) < t, yet Jac(A∪B, C) ≥ t — C joins only
  * through the merged entity). CC over round-1 edges is the FLOOR of this
  * fixpoint; every extra round only adds merges.
  *
  * Candidacy per round is banded MinHash over entity profiles, and the
  * signatures FOLD instead of re-hashing: the MinHash of a set union is
  * the elementwise minimum of the members' signatures, so entity mins are
  * one groupBy-min over doc mins — no per-round pass over text. Match =
  * exact Jaccard of the entity token sets at `thr`, verified on the
  * banded candidates only.
  *
  * Scale shape per round: the token relation is the exploded
  * (entity_id, token) distinct pairs — O(corpus tokens), map-side
  * combined; the band self-join carries only (entity_id, band key); the
  * Jaccard verify runs on candidate pairs (O(N·bucket)); merging is
  * [[Components.connectedComponents]] over the match edges (≪ corpus).
  * Entity count strictly decreases every non-final round, and real
  * corpora converge in 1-3 rounds; a non-converged `maxRounds` fails
  * loudly rather than returning a silent partial fixpoint.
  */
object Swoosh {

  /** @param docToks (doc_id, toks: array<string>) distinct token/shingle
    *                sets — the mergeable profile
    * @param docMins (doc_id, mins: array<long>) the 12 MinHash minima the
    *                banded blocking layer derives (3 rows × 4 bands,
    *                SparkEntry.sBandKeys order)
    * @param thr     Jaccard match threshold on merged profiles
    * @return (doc_id, entity_id) at the match-merge fixpoint; entity_id =
    *         min member doc_id
    */
  def resolve(docToks: DataFrame, docMins: DataFrame, thr: Double,
              maxRounds: Int = 10)(implicit spark: SparkSession): DataFrame = {
    val toksRel = docToks
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .localCheckpoint(true)
    val minsRel = docMins
      .select(col("doc_id"), posexplode(col("mins")).as(Seq("pos", "m")))
      .localCheckpoint(true)

    var assign = docToks.select(col("doc_id"), col("doc_id").as("entity_id"))
      .localCheckpoint(true)
    var rounds = 0
    var done = false
    while (!done) {
      require(rounds < maxRounds,
        s"Swoosh.resolve: no fixpoint after $maxRounds rounds")
      val eToks = assign.join(toksRel, "doc_id")
        .select(col("entity_id"), col("tok")).distinct()
        .localCheckpoint(true)
      val sizes = eToks.groupBy("entity_id").agg(count(lit(1)).as("n"))
      // entity signature = elementwise min over member docs' mins
      val minCols = (0 until 12).map(j =>
        min(when(col("pos") === j, col("m"))).as(s"m$j"))
      val eBands = assign.join(minsRel, "doc_id")
        .groupBy("entity_id")
        .agg(minCols.head, minCols.tail: _*)
        .select(col("entity_id"), explode(array((0 until 4).map(b =>
          concat_ws(":", lit(b), col(s"m${3 * b}"), col(s"m${3 * b + 1}"),
            col(s"m${3 * b + 2}"))): _*)).as("bk"))
      val cand = eBands.select(col("entity_id").as("a"), col("bk"))
        .join(eBands.select(col("entity_id").as("b"), col("bk")), Seq("bk"))
        .filter(col("a") < col("b"))
        .select("a", "b").distinct()
      val matches = cand
        .join(eToks.select(col("entity_id").as("a"), col("tok")), Seq("a"))
        .join(eToks.select(col("entity_id").as("b"), col("tok")), Seq("b", "tok"))
        .groupBy("a", "b").agg(count(lit(1)).as("inter"))
        .join(sizes.select(col("entity_id").as("a"), col("n").as("na")), "a")
        .join(sizes.select(col("entity_id").as("b"), col("n").as("nb")), "b")
        .filter(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")) >= thr)
        .select(col("a").as("src"), col("b").as("dst"))
        .localCheckpoint(true)
      if (matches.isEmpty) done = true
      else {
        val merged = Components.connectedComponents(matches)
          .select(col("doc_id").as("entity_id"), col("cluster_id"))
        assign = assign.join(merged, Seq("entity_id"), "left")
          .select(col("doc_id"),
            coalesce(col("cluster_id"), col("entity_id")).as("entity_id"))
          .localCheckpoint(true)
      }
      rounds += 1
    }
    assign
  }
}
