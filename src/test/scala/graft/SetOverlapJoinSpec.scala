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

  /** Non-null/non-empty guards the ratio form requires to fire (the rule
    * cannot reproduce legacy both-NULL passes or ANSI both-empty
    * DIVIDE_BY_ZERO, so unguarded ratio queries are left untouched).
    */
  private def nonEmptyGuards =
    size(col("ta")) > 0 && size(col("tb")) > 0

  private def withConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach { case (k, ov) =>
      ov.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  /** The ratio form discovers its non-empty guards via the children's
    * constraint sets (PushDownPredicates moves one-sided guards below the
    * join). With LocalRelation test inputs, ConvertToLocalRelation eagerly
    * evaluates those pushed Filters away — constraints and all — which
    * parquet/file sources never do; exclude it so the ratio tests exercise
    * the production plan shape (Filter above the relation).
    */
  private val keepFilters =
    "spark.sql.optimizer.excludedRules" ->
      "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation"

  test("jaccard-ratio form with non-empty guards rewrites and matches the no-rule run") {
    val a = df("ida", "ta", Seq(1L -> Seq("x", "y", "z", "w"), 2L -> Seq("a", "b"),
      3L -> Seq("x", "y")))
    val b = df("idb", "tb", Seq(10L -> Seq("x", "y", "z"), 11L -> Seq("a", "c"),
      12L -> Seq("k")))
    withConf(keepFilters) {
      val build = () => a.crossJoin(b).filter(nonEmptyGuards && jacCond >= 0.5)
      val want = build().collect().map(r => (r.getLong(0), r.getLong(2))).toSeq.sorted
      withRule {
        val q = build()
        assert(q.collect().map(r => (r.getLong(0), r.getLong(2))).toSeq.sorted === want)
        assert(q.queryExecution.executedPlan.toString.contains("__graft_oj_key"))
      }
    }
  }

  test("unguarded ratio form does not fire — legacy both-NULL pass is preserved") {
    // ADVICE r3 (medium): with ANSI off and legacy sizeOfNull, a both-NULL
    // pair evaluates (-1)/(-1) = 1.0 and PASSES the naive Jaccard predicate;
    // explode(outer=false) would silently drop it. The rule must therefore
    // not fire without guards, keeping Spark's own semantics.
    val a = df("ida", "ta", Seq(1L -> null, 2L -> Seq("x", "y")))
    val b = df("idb", "tb", Seq(10L -> null, 11L -> Seq("x", "y")))
    withConf("spark.sql.ansi.enabled" -> "false",
             "spark.sql.legacy.sizeOfNull" -> "true") {
      val build = () => a.crossJoin(b).filter(jacCond >= 0.5)
      val want = build().collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      assert(want.contains((1L, 10L)), "legacy semantics: both-NULL pair passes")
      withRule {
        val q = build()
        assert(!q.queryExecution.executedPlan.toString.contains("__graft_oj_key"),
          "unguarded ratio form must not rewrite")
        assert(q.collect().map(r => (r.getLong(0), r.getLong(2))).toSet === want)
      }
    }
  }

  test("ANSI both-empty: unguarded ratio preserves the DIVIDE_BY_ZERO; guarded rewrites cleanly") {
    val a = df("ida", "ta", Seq(1L -> Seq.empty[String], 2L -> Seq("x", "y")))
    val b = df("idb", "tb", Seq(10L -> Seq.empty[String], 11L -> Seq("x", "y")))
    def hasDivZero(t: Throwable): Boolean =
      t != null && (t.toString.contains("DIVIDE_BY_ZERO") || hasDivZero(t.getCause))
    withConf("spark.sql.ansi.enabled" -> "true", keepFilters) {
      withRule {
        // unguarded: rule must not fire, so Spark's own ANSI error on the
        // both-empty pair (0/0) is preserved bit-for-bit
        val unguarded = a.crossJoin(b).filter(jacCond >= 0.5)
        assert(!unguarded.queryExecution.executedPlan.toString.contains("__graft_oj_key"))
        val err = intercept[Exception](unguarded.collect())
        assert(hasDivZero(err), s"expected ANSI divide-by-zero, got: $err")
        // guarded: fires, and the And short-circuit keeps the original
        // error-free too — both plans agree
        val guarded = a.crossJoin(b).filter(nonEmptyGuards && jacCond >= 0.5)
        assert(guarded.queryExecution.executedPlan.toString.contains("__graft_oj_key"))
        assert(guarded.collect().map(r => (r.getLong(0), r.getLong(2))).toSet ===
          Set((2L, 11L)))
      }
    }
  }

  test("guarded ratio with an UNSAFE denominator does not fire — ANSI 0/0 on a disjoint pair preserved") {
    // guards prove the arrays non-empty, but size(ta) - size(tb) is 0 for
    // a guard-passing DISJOINT equal-size pair: the original plan throws
    // DIVIDE_BY_ZERO under ANSI while the exploded join would silently
    // drop the pair — so only recognized ≥1-on-domain denominators
    // (Jaccard/Dice/overlap forms) may fire
    val a = df("ida", "ta", Seq(1L -> Seq("x")))
    val b = df("idb", "tb", Seq(10L -> Seq("y")))
    val inter = size(array_intersect(col("ta"), col("tb")))
    val badRatio = inter.cast("double") /
      (size(col("ta")) - size(col("tb"))).cast("double")
    withConf("spark.sql.ansi.enabled" -> "true", keepFilters) {
      withRule {
        val q = a.crossJoin(b).filter(nonEmptyGuards && badRatio >= 0.5)
        assert(!q.queryExecution.executedPlan.toString.contains("__graft_oj_key"),
          "unsafe-denominator ratio must not rewrite")
        val err = intercept[Exception](q.collect())
        assert(err.toString.contains("DIVIDE_BY_ZERO") ||
          Option(err.getCause).exists(_.toString.contains("DIVIDE_BY_ZERO")),
          s"expected the original ANSI divide-by-zero to survive, got: $err")
      }
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

  test("fuzz incl. null/empty ARRAYS, null elements, duplicates: with-rule equals without-rule") {
    val rnd = new scala.util.Random(7)
    val alphabet = Vector("a", "b", "c", "d", "e", null)
    // ~1 in 8 rows gets a NULL array, ~1 in 8 an empty array — the inputs
    // the r3 fuzz never generated (ADVICE r3)
    def randRows(n: Int): Seq[(Long, Seq[String])] =
      (0 until n).map { i =>
        val roll = rnd.nextInt(8)
        val toks =
          if (roll == 0) null
          else if (roll == 1) Seq.empty[String]
          else Seq.fill(1 + rnd.nextInt(5))(alphabet(rnd.nextInt(alphabet.size)))
        (i.toLong, toks)
      }
    // count forms fire unguarded (exact in both null modes); ratio forms
    // need the non-empty guards to fire
    def builds(a: DataFrame, b: DataFrame): Seq[() => DataFrame] = Seq(
      () => a.crossJoin(b).filter(size(array_intersect(col("ta"), col("tb"))) >= 1),
      () => a.crossJoin(b).filter(size(array_intersect(col("ta"), col("tb"))) > 1),
      () => a.crossJoin(b).filter(nonEmptyGuards && jacCond >= 0.4),
      () => a.crossJoin(b).filter(nonEmptyGuards && lit(0.3) < jacCond))
    // both null modes: Spark 4 ANSI default, and legacy sizeOfNull (where
    // size(NULL) = -1 and a both-NULL ratio would pass — guards drop it
    // identically in both plans)
    val modes = Seq(
      Seq("spark.sql.ansi.enabled" -> "true", keepFilters),
      Seq("spark.sql.ansi.enabled" -> "false", "spark.sql.legacy.sizeOfNull" -> "true",
        keepFilters))
    for (mode <- modes; trial <- 1 to 3) {
      val a = df("ida", "ta", randRows(12))
      val b = df("idb", "tb", randRows(12))
      withConf(mode: _*) {
        builds(a, b).zipWithIndex.foreach { case (build, bi) =>
          val want = build().collect()
            .map(r => (r.getLong(0), r.getLong(2))).toSeq.sorted
          withRule {
            val q = build()
            val got = q.collect().map(r => (r.getLong(0), r.getLong(2))).toSeq.sorted
            assert(got === want, s"mode $mode trial $trial build $bi")
            assert(q.queryExecution.executedPlan.toString.contains("__graft_oj_key"),
              s"mode $mode trial $trial build $bi: rule did not fire")
          }
        }
      }
    }
  }
}
