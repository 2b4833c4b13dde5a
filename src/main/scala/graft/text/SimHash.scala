package graft.text

/** 64-bit SimHash over word tokens (Charikar 2002): per-bit weighted vote of
  * token hashes. Near-duplicate texts land within a small Hamming radius —
  * the text-side analog of the reference's 64-bit pHash + Hamming radius
  * predicate (`hash/hash.go:157-159`, `vptree/vptree.go:167`).
  */
object SimHash {

  def simhash64(text: String): Long = simhashOfTokens(Tokenize.words(text))

  def simhashOfTokens(tokens: Array[String]): Long = {
    if (tokens.isEmpty) return 0L
    val votes = new Array[Int](64)
    var i = 0
    while (i < tokens.length) {
      val h = Hashing.hash64(tokens(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  /** Band keys for Hamming-radius blocking on a 64-bit hash: `bands` exact
    * sub-keys of width 64/bands bits, band index mixed in. Pigeonhole: a pair
    * at Hamming distance d shares at least one exact band when d < bands —
    * guaranteed recall for d ≤ bands−1, probabilistic above (SURVEY.md §7.4.1).
    */
  def hammingBandKeys(hash: Long, bands: Int): Array[Long] = {
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1L
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      val chunk = (hash >>> (b * width)) & mask
      out(b) = Hashing.hash64(0x68616dL + b, chunk)
      b += 1
    }
    out
  }
}
