package graft

import graft.pipeline.Canopy
import org.scalatest.funsuite.AnyFunSuite

/** Canopy blocking vs the sequential greedy definition (McCallum et al.,
  * KDD 2000): smallest pooled doc becomes a center, loose neighbors join
  * its canopy, tight neighbors leave the pool. The library derives the
  * center set order-free (lex-first MIS of the tight graph); these tests
  * pin that derivation to the sequential loop on randomized graphs, prove
  * the distributed MIS path equals the driver fast path, and exercise the
  * overlap semantics single-threshold blocking cannot express.
  */
class CanopySpec extends AnyFunSuite with SparkTestBase {

  private def seqCanopy(loose: Seq[(String, String)], tight: Seq[(String, String)],
                        universe: Seq[String]): Set[(String, String)] = {
    def adj(es: Seq[(String, String)]): Map[String, Set[String]] =
      (es.flatMap { case (a, b) => Seq(a -> b, b -> a) })
        .filter { case (a, b) => a != b }
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val la = adj(loose)
    val ta = adj(tight)
    val pool = scala.collection.mutable.SortedSet(universe: _*)
    val out = scala.collection.mutable.Set.empty[(String, String)]
    while (pool.nonEmpty) {
      val c = pool.head
      out += ((c, c))
      la.getOrElse(c, Set.empty).foreach(v => out += ((c, v)))
      pool -= c
      ta.getOrElse(c, Set.empty).foreach(pool -= _)
    }
    out.toSet
  }

  private def run(loose: Seq[(String, String)], tight: Seq[(String, String)],
                  universe: Seq[String], cutoff: Long = 200000): Set[(String, String)] = {
    implicit val s = spark
    import s.implicits._
    Canopy.canopies(loose.toDF("src", "dst"), tight.toDF("src", "dst"),
        universe.toDF("doc_id"), driverCutoff = cutoff)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
  }

  /** Seeded random two-threshold graph: weighted pairs, weight 2 = tight. */
  private def randomCase(seed: Int, n: Int, m: Int):
      (Seq[(String, String)], Seq[(String, String)], Seq[String]) = {
    val rnd = new scala.util.Random(seed)
    def node() = f"n${rnd.nextInt(n)}%03d"
    val weighted = Seq.fill(m)((node(), node(), 1 + rnd.nextInt(2)))
      .filter { case (a, b, _) => a != b }
    val loose = weighted.map { case (a, b, _) => (a, b) }
    val tight = weighted.collect { case (a, b, 2) => (a, b) }
    val universe = (0 until n).map(i => f"n$i%03d")
    (loose, tight, universe)
  }

  test("canopies equal the sequential greedy on randomized two-threshold graphs") {
    for (seed <- 1 to 8) {
      val (loose, tight, universe) = randomCase(seed, n = 40, m = 60)
      assert(run(loose, tight, universe) === seqCanopy(loose, tight, universe),
        s"seed $seed")
    }
  }

  test("distributed MIS path equals the driver fast path") {
    val (loose, tight, universe) = randomCase(99, n = 30, m = 45)
    assert(run(loose, tight, universe, cutoff = 0) ===
      run(loose, tight, universe))
  }

  test("overlap: a doc loose-close to two tight-separated centers joins both canopies") {
    // tight: (a,b) → centers {a, c, d}; loose adds c−b and d−b: b sits in
    // THREE canopies (a's via tight⊆loose, c's and d's via loose-only).
    val tight = Seq(("a", "b"))
    val loose = tight ++ Seq(("c", "b"), ("d", "b"))
    val got = run(loose, tight, Seq("a", "b", "c", "d"))
    assert(got === Set(("a", "a"), ("a", "b"), ("c", "c"), ("c", "b"),
      ("d", "d"), ("d", "b")))
    assert(got === seqCanopy(loose, tight, Seq("a", "b", "c", "d")))
  }

  test("tight-isolated universe docs become singleton canopies") {
    val got = run(loose = Seq(("x", "y")), tight = Seq.empty,
      universe = Seq("x", "y", "z"))
    assert(got === Set(("x", "x"), ("x", "y"), ("y", "y"), ("y", "x"),
      ("z", "z")))
  }
}
