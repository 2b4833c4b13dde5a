package graft

import graft.plans.HammingJoinRule
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The HammingJoinRule contract: a naively-written O(N²) Hamming join
  * (cross join + bit_count filter) must plan as a band equi-join — same
  * rows, same multiplicities, no nested-loop operator — and must NOT fire
  * where the pigeonhole guarantee does not hold (k > 7) or where an
  * equi-key already exists.
  */
class HammingJoinSpec extends AnyFunSuite with SparkTestBase {

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations = Seq(HammingJoinRule)
    try f finally { spark.experimental.extraOptimizations = Nil }
  }

  private val base = 0x0123456789abcdefL
  private def flip(h: Long, bits: Int*): Long = bits.foldLeft(h)((x, b) => x ^ (1L << b))

  private def left(rows: (Long, Long)*): DataFrame = {
    import spark.implicits._
    rows.toDF("ida", "ha")
  }
  private def right(rows: (Long, Long)*): DataFrame = {
    import spark.implicits._
    rows.toDF("idb", "hb")
  }

  private def naive(a: DataFrame, b: DataFrame, k: Int): DataFrame =
    a.crossJoin(b).filter(bit_count(col("ha").bitwiseXOR(col("hb"))) < k)

  private def brute(a: DataFrame, b: DataFrame, k: Int): Set[(Long, Long)] = {
    val as = a.collect().map(r => (r.getLong(0), r.getLong(1)))
    val bs = b.collect().map(r => (r.getLong(0), r.getLong(1)))
    (for {
      (ia, ha) <- as; (ib, hb) <- bs
      if java.lang.Long.bitCount(ha ^ hb) < k
    } yield (ia, ib)).toSet
  }

  test("rewrites the naive cross join: same rows, no nested-loop operator, banded keys in plan") {
    val a = left((1L, base), (2L, flip(base, 0, 17)), (3L, flip(base, 1, 9, 33, 60)),
      (4L, ~base), (5L, flip(base, 63)))
    val b = right((10L, base), (11L, flip(base, 5)), (12L, flip(base, 2, 12, 22, 42, 52, 62)),
      (13L, ~flip(base, 7)))
    withRule {
      val df = naive(a, b, 7)
      val got = df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      assert(got == brute(a, b, 7))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("__graft_hj_key"), "band keys missing — rule did not fire")
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"nested-loop operator survived the rewrite:\n${plan.take(2000)}")
    }
  }

  test("boundary: d = k-1 kept, d = k dropped (strict <), and <= form rewrites too") {
    val a = left((1L, base))
    val b = right((20L, flip(base, 3, 14, 25)), (21L, flip(base, 3, 14, 25, 36)))
    withRule {
      // k = 4: d=3 kept, d=4 dropped
      val lt = naive(a, b, 4)
      assert(lt.collect().map(_.getLong(2)).toSet == Set(20L))
      assert(lt.queryExecution.executedPlan.toString.contains("__graft_hj_key"))
      val le = a.crossJoin(b).filter(bit_count(col("ha").bitwiseXOR(col("hb"))) <= 3)
      assert(le.collect().map(_.getLong(2)).toSet == Set(20L))
      assert(le.queryExecution.executedPlan.toString.contains("__graft_hj_key"))
    }
  }

  test("multiplicity: duplicate input rows produce duplicate output rows") {
    val a = left((1L, base), (1L, base)) // same row twice
    val b = right((10L, flip(base, 11)))
    withRule {
      val rows = naive(a, b, 3).collect()
      assert(rows.length == 2, s"expected 2 rows (one per duplicate), got ${rows.length}")
    }
  }

  test("does not fire for k > 7 (no pigeonhole guarantee) or when an equi-key exists") {
    val a = left((1L, base), (2L, flip(base, 0)))
    val b = right((10L, base), (11L, flip(base, 1)))
    withRule {
      val tooWide = naive(a, b, 9)
      val planWide = tooWide.queryExecution.executedPlan.toString
      assert(!planWide.contains("__graft_hj_key"), "rule fired beyond its guarantee")
      assert(tooWide.collect().map(r => (r.getLong(0), r.getLong(2))).toSet == brute(a, b, 9))

      val withKey = a.join(b, col("ida") === col("idb") - 9 &&
        bit_count(col("ha").bitwiseXOR(col("hb"))) < 3)
      assert(!withKey.queryExecution.executedPlan.toString.contains("__graft_hj_key"),
        "rule fired despite an existing equi-key")
    }
  }

  test("randomized: rewritten join equals brute force (200 x 200, k in 2..7)") {
    val rnd = new scala.util.Random(42)
    def randHash(): Long = rnd.nextLong()
    // seed clusters of near hashes so matches actually exist
    val seeds = Array.fill(8)(randHash())
    def near(h: Long): Long = flip(h, Array.fill(rnd.nextInt(4))(rnd.nextInt(64)).toSeq: _*)
    val as = (1L to 200L).map(i => (i, if (i % 3 == 0) near(seeds(rnd.nextInt(8))) else randHash()))
    val bs = (1L to 200L).map(i => (i + 1000L, if (i % 3 == 1) near(seeds(rnd.nextInt(8))) else randHash()))
    val (a, b) = (left(as: _*), right(bs: _*))
    withRule {
      Seq(2, 5, 7).foreach { k =>
        val got = naive(a, b, k).collect().map(r => (r.getLong(0), r.getLong(2))).toSet
        assert(got == brute(a, b, k), s"k=$k mismatch")
      }
    }
  }

  test("production injection path: GraftExtensions session rewrites inside the operator-optimization batch") {
    // getOrCreate reuses the shared test session and ignores extensions,
    // so clear the default/active session, build one WITH GraftExtensions
    // on the same SparkContext, and restore afterwards. This exercises
    // injectOptimizerRule's real placement (the operator-optimization
    // fixpoint, where PushPredicateThroughJoin must fire first), not the
    // experimental extraOptimizations batch the other tests use.
    import org.apache.spark.sql.SparkSession
    val old = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      import s2.implicits._
      val a = Seq((1L, base), (2L, flip(base, 0, 17))).toDF("ida", "ha")
      val b = Seq((10L, base), (11L, flip(base, 5))).toDF("idb", "hb")
      val df = a.crossJoin(b).filter(bit_count(col("ha").bitwiseXOR(col("hb"))) < 7)
      val got = df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      assert(got == Set((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L)).filter {
        case (ia, ib) =>
          val ha = if (ia == 1L) base else flip(base, 0, 17)
          val hb = if (ib == 10L) base else flip(base, 5)
          java.lang.Long.bitCount(ha ^ hb) < 7
      })
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("__graft_hj_key"), "rule not active via GraftExtensions")
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    } finally {
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }
}
