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

  // ---- center clustering ----

  private def centers(edges: Seq[(String, String)], cutoff: Long): Map[String, String] = {
    implicit val s = spark
    import s.implicits._
    Components.centerClusters(edges.toDF("src", "dst"), driverCutoff = cutoff)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
  }

  /** Independent sequential greedy (the definition), written against a
    * sorted adjacency map rather than Components' internals.
    */
  private def centerOracle(edges: Seq[(String, String)]): Map[String, String] = {
    val adj = scala.collection.mutable.Map.empty[String, Set[String]].withDefaultValue(Set.empty)
    edges.filter(e => e._1 != e._2).foreach { case (a, b) =>
      adj(a) = adj(a) + b; adj(b) = adj(b) + a
    }
    val assigned = scala.collection.mutable.Map.empty[String, String]
    adj.keys.toSeq.sorted.foreach { u =>
      if (!assigned.contains(u)) {
        assigned(u) = u
        adj(u).toSeq.sorted.foreach(v => if (!assigned.contains(v)) assigned(v) = u)
      }
    }
    assigned.toMap
  }

  private def checkCenters(edges: Seq[(String, String)]): Unit = {
    val want = centerOracle(edges)
    assert(centers(edges, cutoff = 0) == want, "distributed rounds != sequential greedy")
    assert(centers(edges, cutoff = Long.MaxValue) == want, "driver fast path != sequential greedy")
  }

  test("center: claim must NOT finalize during rounds (round-2 center is smaller)") {
    // 6 touches round-1 center 5 but the greedy assigns it to center 3
    val edges = Seq(("1", "2"), ("2", "3"), ("3", "6"), ("5", "6"))
    checkCenters(edges)
    assert(centerOracle(edges) ==
      Map("1" -> "1", "2" -> "1", "3" -> "3", "6" -> "3", "5" -> "5"))
  }

  test("center: sorted path peels two nodes per round; radius-1 semantics hold") {
    val path = (1 to 10).map(i => (f"$i%02d", f"${i + 1}%02d"))
    checkCenters(path)
    // CC merges the whole chain into one cluster; centers split it
    val c = centers(path, cutoff = 0)
    assert(c.values.toSet.size > 1)
    c.foreach { case (n, ctr) =>
      assert(n == ctr || path.contains((ctr, n)) || path.contains((n, ctr)),
        s"$n assigned to non-adjacent center $ctr — radius-1 violated")
    }
  }

  test("center: isolated-by-claims node becomes its own center") {
    checkCenters(Seq(("1", "2"), ("2", "3")))
    assert(centerOracle(Seq(("1", "2"), ("2", "3"))) ==
      Map("1" -> "1", "2" -> "1", "3" -> "3"))
  }

  test("center: star hub, triangle, duplicate and reversed edges") {
    checkCenters(Seq(("5", "1"), ("5", "2"), ("5", "3"), ("5", "4")))
    checkCenters(Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "a")))
    checkCenters((1 to 40).map(i => (s"h", s"n$i")) ++ Seq(("n1", "n2"), ("x", "y")))
  }

  test("center: randomized graphs match the sequential greedy (both paths)") {
    val rnd = new scala.util.Random(20260817)
    (1 to 5).foreach { _ =>
      val n = 30 + rnd.nextInt(40)
      val edges = (1 to 3 * n).map(_ =>
        (f"${rnd.nextInt(n)}%03d", f"${rnd.nextInt(n)}%03d")).filter(e => e._1 != e._2)
      checkCenters(edges)
    }
  }
}
