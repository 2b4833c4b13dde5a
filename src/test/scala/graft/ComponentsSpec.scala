package graft

import graft.pipeline.Components
import org.scalatest.funsuite.AnyFunSuite

/** Large-star/small-star connected components vs a driver-side union-find
  * oracle, including pathological shapes (long chains — worst case for
  * min-propagation; star hubs — worst case for neighborhood aggregation).
  */
class ComponentsSpec extends AnyFunSuite with SparkTestBase {

  private def cc(edges: Seq[(String, String)]): Map[String, String] = {
    implicit val s = spark
    import s.implicits._
    val df = edges.toDF("src", "dst")
    Components.connectedComponents(df).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
  }

  private def oracle(edges: Seq[(String, String)]): Map[String, String] = {
    val parent = scala.collection.mutable.Map.empty[String, String]
    def find(x: String): String = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def check(edges: Seq[(String, String)]): Unit = {
    val got = cc(edges)
    val want = oracle(edges)
    // same grouping AND representative = min of component
    assert(got == want.map { case (k, _) => k -> want.filter(_._2 == want(k)).keys.min }
      .map(identity), s"mismatch")
    got.groupBy(_._2).foreach { case (cid, m) => assert(m.keys.min == cid) }
  }

  test("triangle + disjoint pair") {
    check(Seq(("a", "b"), ("b", "c"), ("a", "c"), ("x", "y")))
  }

  test("transitive chain A-B, B-C clusters {A,B,C} (SURVEY §2.5 deviation from greedy-star)") {
    val m = cc(Seq(("a", "b"), ("b", "c")))
    assert(m == Map("a" -> "a", "b" -> "a", "c" -> "a"))
  }

  test("long chain (50 nodes) converges to one component") {
    val ids = (0 until 50).map(i => f"n$i%03d")
    val edges = ids.sliding(2).map(p => (p(0), p(1))).toSeq
    val m = cc(edges)
    assert(m.values.toSet == Set("n000"))
    assert(m.size == 50)
  }

  test("star hub with 100 leaves") {
    val edges = (1 to 100).map(i => (f"leaf$i%03d", "hub"))
    val m = cc(edges)
    assert(m.values.toSet == Set("hub"))
  }

  test("random graphs match union-find oracle") {
    val rnd = new scala.util.Random(13)
    (1 to 3).foreach { _ =>
      val n = 60
      val edges = (1 to 80).map { _ =>
        (f"v${rnd.nextInt(n)}%03d", f"v${rnd.nextInt(n)}%03d")
      }.filter(e => e._1 != e._2)
      check(edges)
    }
  }

  test("self-loops and duplicate edges are tolerated") {
    val m = cc(Seq(("a", "a"), ("a", "b"), ("b", "a"), ("a", "b")))
    assert(m == Map("a" -> "a", "b" -> "a"))
  }
}
