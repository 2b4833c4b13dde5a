package graft

/** Independent JVM mirror of the banded-MinHash definition (SparkEntry's
  * sBandKeys SQL contract): 8-char shingles of the first 120 chars → md5
  * top 28 bits → 12 affine mins mod SBandP → 4 position-tagged band keys.
  * Only the definition CONSTANTS are shared with the library; the kernel
  * code is re-written here so spec cross-checks are value-independent.
  */
object BandMirror {

  def h28(tok: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8"))
    ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
      ((d(2) & 0xffL) << 4) | ((d(3) & 0xffL) >>> 4)
  }

  def minsOf(toks: Iterable[String]): IndexedSeq[Long] = {
    val hs = toks.map(h28).toArray
    SparkEntry.SBandAB.map { case (a, b) =>
      hs.iterator.map(h => (a * h + b) % SparkEntry.SBandP).min
    }
  }

  def bandsOf(mins: IndexedSeq[Long]): Set[String] =
    (0 until 4).map(b =>
      s"$b:${mins(3 * b)}:${mins(3 * b + 1)}:${mins(3 * b + 2)}").toSet

  /** Sliding 8-char shingles over the first 120 chars, degenerate-short
    * window included — the set family the signature sketches.
    */
  def shingles(text: String): Set[String] = {
    val t = text.substring(0, math.min(120, text.length))
    (0 until math.max(t.length - 7, 1))
      .map(i => t.substring(i, math.min(i + 8, t.length))).toSet
  }

  def jac(a: Set[String], b: Set[String]): Double = {
    val i = (a & b).size
    i.toDouble / (a.size + b.size - i)
  }
}
