package graft

import graft.plans.SetOverlapJoinRule
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SetOverlapJoinRule contract: a naively-written O(N²) set-similarity
  * join (cross join + intersection-size or Jaccard filter) must plan as an
  * element equi-join — same rows, same multiplicities, no nested-loop
  * operator — and must NOT fire where candidacy would be lossy (threshold
  * 0) or where an equi-key already exists. The fuzz oracle is the SAME
  * query run without the rule, so Spark's own null/duplicate semantics are
  * the reference.
  */
class SetOverlapJoinSpec extends AnyFunSuite with SparkTestBase {

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations = Seq(SetOverlapJoinRule)
    try f finally { spark.experimental.extraOptimizations = Nil }
  }

  private def df(col1: String, col2: String, rows: Seq[(Long, Seq[String])]): DataFrame = {
    import spark.implicits._
    rows.toDF(col1, col2)
  }

  private def jacCond = {
    val inter = size(array_intersect(col("ta"), col("tb")))
    inter.cast("double") /
      (size(col("ta")) + size(col("tb")) - inter).cast("double")
  }

  test("overlap form rewrites: same rows, no nested loop, element keys in plan") {
    val a = df("ida", "ta", Seq(1L -> Seq("x", "y", "z"), 2L -> Seq("p", "q"),
      3L -> Seq("x", "q", "r")))
    val b = df("idb", "tb", Seq(10L -> Seq("y", "z"), 11L -> Seq("q"),
      12L -> Seq("m", "n")))
    withRule {
      val q = a.crossJoin(b)
        .filter(size(array_intersect(col("ta"), col("tb"))) >= 2)
      assert(q.collect().map(r => (r.getLong(0), r.getLong(2))).toSet === Set((1L, 10L)))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("__graft_oj_key"), "element keys missing — rule did not fire")
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"nested-loop operator survived the rewrite:\n${plan.take(2000)}")
    }
  }

  test("jaccard-ratio form rewrites and matches the no-rule run") {
    val a = df("ida", "ta", Seq(1L -> Seq("x", "y", "z", "w"), 2L -> Seq("a", "b"),
      3L -> Seq("x", "y")))
    val b = df("idb", "tb", Seq(10L -> Seq("x", "y", "z"), 11L -> Seq("a", "c"),
      12L -> Seq("k")))
    val build = () => a.crossJoin(b).filter(jacCond >= 0.5)
    val want = build().collect().map(r => (r.getLong(0), r.getLong(2))).toSeq.sorted
    withRule {
      val q = build()
      assert(q.collect().map(r => (r.getLong(0), r.getLong(2))).toSeq.sorted === want)
      assert(q.queryExecution.executedPlan.toString.contains("__graft_oj_key"))
    }
  }

  test("guards: threshold 0, existing equi-key, and disjunctions do not rewrite") {
    val a = df("ida", "ta", Seq(1L -> Seq("x")))
    val b = df("idb", "tb", Seq(10L -> Seq("y")))
    withRule {
      // jac >= 0.0 is satisfied by disjoint sets — candidacy would be lossy
      val zero = a.crossJoin(b).filter(jacCond >= 0.0)
      assert(!zero.queryExecution.executedPlan.toString.contains("__graft_oj_key"))
      assert(zero.count() === 1) // disjoint pair passes at threshold 0
      // an equi-conjunct already hash-partitions; leave the join alone
      val equi = a.join(b, col("ida") === col("idb") &&
        size(array_intersect(col("ta"), col("tb"))) >= 1)
      assert(!equi.queryExecution.executedPlan.toString.contains("__graft_oj_key"))
      // overlap under a disjunction must not drive candidacy
      val disj = a.crossJoin(b)
        .filter(size(array_intersect(col("ta"), col("tb"))) >= 1 ||
          col("ida") === col("idb"))
      assert(!disj.queryExecution.executedPlan.toString.contains("__graft_oj_key"))
    }
  }

  test("multiplicity: duplicate input rows produce duplicate output rows") {
    val a = df("ida", "ta", Seq(1L -> Seq("x", "y"), 1L -> Seq("x", "y")))
    val b = df("idb", "tb", Seq(10L -> Seq("x", "y", "z")))
    withRule {
      val rows = a.crossJoin(b)
        .filter(size(array_intersect(col("ta"), col("tb"))) >= 2).collect()
      assert(rows.length === 2, s"expected one output row per duplicate input row")
    }
  }

  test("fuzz incl. null elements and duplicates: with-rule equals without-rule") {
    val rnd = new scala.util.Random(7)
    val alphabet = Vector("a", "b", "c", "d", "e", null)
    def randRows(n: Int): Seq[(Long, Seq[String])] =
      (0 until n).map { i =>
        (i.toLong, Seq.fill(1 + rnd.nextInt(5))(alphabet(rnd.nextInt(alphabet.size))))
      }
    for (trial <- 1 to 5) {
      val a = df("ida", "ta", randRows(12))
      val b = df("idb", "tb", randRows(12))
      val builds: Seq[() => DataFrame] = Seq(
        () => a.crossJoin(b).filter(size(array_intersect(col("ta"), col("tb"))) >= 1),
        () => a.crossJoin(b).filter(size(array_intersect(col("ta"), col("tb"))) > 1),
        () => a.crossJoin(b).filter(jacCond >= 0.4),
        () => a.crossJoin(b).filter(lit(0.3) < jacCond))
      builds.zipWithIndex.foreach { case (build, bi) =>
        val want = build().collect()
          .map(r => (r.getLong(0), r.getLong(2))).toSeq.sorted
        withRule {
          val q = build()
          val got = q.collect().map(r => (r.getLong(0), r.getLong(2))).toSeq.sorted
          assert(got === want, s"trial $trial build $bi")
          assert(q.queryExecution.executedPlan.toString.contains("__graft_oj_key"),
            s"trial $trial build $bi: rule did not fire")
        }
      }
    }
  }
}
