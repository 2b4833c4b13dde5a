package graft

import graft.model.DocSig
import graft.pipeline.{Blocking, GraftConfig}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's randomized tree-vs-linear-scan oracle
  * (`vptree/vptree_test.go:11-55`), reimagined for the block-join:
  * 256 media-only items with hashes 0..255 (max distance 8), thresholds in
  * [3,6] — the blocked, salted candidate pipeline must yield EXACTLY the
  * brute-force crossJoin pairs under `bit_count(h1 ^ h2) < t`
  * (FIXTURES.md F2; recall is pigeonhole-guaranteed since t−1 < 16 bands).
  * Run at several thresholds mirroring `go test --count 5`.
  */
class BlockJoinOracleSpec extends AnyFunSuite with SparkTestBase {

  private def pairsViaPipeline(t: Int): Set[(String, String, Int)] = {
    implicit val s = spark
    import s.implicits._
    val sigs = s.createDataset((0 until 256).map { i =>
      DocSig(f"i$i%03d", Array(i.toLong), 1, 0L, Array.emptyLongArray, "", 0)
    })
    val cfg = GraftConfig(mediaThreshold = t)
    val (cands, _, _) = Blocking.candidatePairs(sigs, cfg)
    // media distance is an exact phase-2 feature now; the radius predicate
    // (strict <, reference `vptree/vptree.go:167`) is the is_dup decision
    graft.pipeline.Pairs.score(cands, sigs, cfg)
      .filter(org.apache.spark.sql.functions.col("is_dup"))
      .select("a", "b", "media_dist")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
  }

  private def pairsBrute(t: Int): Set[(String, String, Int)] = {
    val out = for {
      i <- 0 until 256
      j <- (i + 1) until 256
      d = java.lang.Long.bitCount((i ^ j).toLong)
      if d < t
    } yield (f"i$i%03d", f"i$j%03d", d)
    out.toSet
  }

  (3 to 6).foreach { t =>
    test(s"blocked join ≡ brute force at threshold $t (vptree_test.go oracle)") {
      assert(pairsViaPipeline(t) == pairsBrute(t))
    }
  }

  test("salted hot-block path yields identical pairs to the unsalted path") {
    implicit val s = spark
    import s.implicits._
    // All 256 items collide into every block (hash 0 or 1) → blocks of ~256
    // rows; force them through the salted path with a tiny hotBlockSize.
    val sigs = s.createDataset((0 until 256).map { i =>
      DocSig(f"i$i%03d", Array((i % 2).toLong), 1, 0L, Array.emptyLongArray, "", 0)
    })
    def run(hot: Int) = {
      val cfg = GraftConfig(mediaThreshold = 2, hotBlockSize = hot)
      val (cands, stats, _) = Blocking.candidatePairs(sigs, cfg)
      (cands.select("a", "b").as[(String, String)].collect().toSet, stats)
    }
    val (unsalted, st0) = run(100000)
    val (salted, st1) = run(8)
    assert(st0.saltedBlocks == 0 && st1.saltedBlocks > 0)
    assert(salted == unsalted)
    assert(salted.nonEmpty)
  }

  test("degenerate blocks are dropped with logged counts, never silently") {
    implicit val s = spark
    import s.implicits._
    val sigs = s.createDataset((0 until 64).map { i =>
      DocSig(f"i$i%03d", Array(0L), 1, 0L, Array.emptyLongArray, "", 0)
    })
    val cfg = GraftConfig(mediaThreshold = 2, maxBlockSize = 10)
    val (cands, stats, _) = Blocking.candidatePairs(sigs, cfg)
    assert(cands.count() == 0)
    assert(stats.droppedBlocks > 0 && stats.droppedRows > 0)
  }
}
