package graft

import graft.sinks.FileActions
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants of the survivorship planner over random
  * cluster shapes: keepers never enter a keep-first delete plan, delete-all
  * takes whole groups, singletons are never touched, move/copy cover every
  * multi-member doc exactly once.
  */
class SurvivorshipPropertySpec extends AnyFunSuite with SparkTestBase {

  private def check(prop: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  // random clusterings: up to 8 clusters, up to 6 members each
  private val clusteringGen: Gen[Map[Long, Seq[Long]]] = for {
    nClusters <- Gen.choose(1, 8)
    sizes <- Gen.listOfN(nClusters, Gen.choose(1, 6))
  } yield {
    var nextId = 0L
    sizes.zipWithIndex.map { case (sz, c) =>
      val members = (0 until sz).map { _ => nextId += 1; nextId }
      (c.toLong, members: Seq[Long])
    }.toMap
  }

  private def toDf(clusters: Map[Long, Seq[Long]]) = {
    import spark.implicits._
    clusters.toSeq.flatMap { case (c, ms) =>
      ms.map(m => (m, c, s"/data/doc$m.bin"))
    }.toDF("doc_id", "cluster_id", "path")
  }

  test("keep-first delete plans never contain a keeper or a singleton") {
    check(forAll(clusteringGen) { clusters =>
      val plan = FileActions.plan(toDf(clusters), "delete").collect()
        .map(_.getAs[String]("doc_id").toLong).toSet
      val keepers = clusters.values.filter(_.size > 1).map(_.min).toSet
      val singletons = clusters.values.filter(_.size == 1).flatten.toSet
      val expected = clusters.values.filter(_.size > 1).flatten.toSet -- keepers
      Prop(plan == expected) :| s"plan=$plan expected=$expected" &&
        Prop((plan & keepers).isEmpty) :| "keeper in delete plan" &&
        Prop((plan & singletons).isEmpty) :| "singleton in delete plan"
    })
  }

  test("delete-all plans take exactly the multi-member groups") {
    check(forAll(clusteringGen) { clusters =>
      val plan = FileActions.plan(toDf(clusters), "delete", keepFirst = false)
        .collect().map(_.getAs[String]("doc_id").toLong).toSet
      val expected = clusters.values.filter(_.size > 1).flatten.toSet
      Prop(plan == expected) :| s"plan=$plan expected=$expected"
    })
  }

  test("move plans cover every multi-member doc exactly once, grouped by cluster") {
    check(forAll(clusteringGen) { clusters =>
      val rows = FileActions.plan(toDf(clusters), "move", destDir = "/dest").collect()
      val planned = rows.map(_.getAs[String]("doc_id").toLong)
      val expected = clusters.values.filter(_.size > 1).flatten.toSet
      val destsOk = rows.forall { r =>
        r.getAs[String]("dest") ==
          s"/dest/group-${r.getAs[String]("cluster_id")}/doc${r.getAs[String]("doc_id")}.bin"
      }
      Prop(planned.toSet == expected && planned.length == expected.size) &&
        Prop(destsOk) :| "bad dest layout"
    })
  }
}
