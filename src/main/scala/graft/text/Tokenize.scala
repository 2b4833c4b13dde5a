package graft.text

/** Tokenization + shingling for text spans.
  *
  * The reference has no text path at all (it hashes pixels); these kernels
  * are the graft-added text analog of its per-image signature stage, per the
  * north rule: MinHash/LSH bands over concatenated text spans.
  */
object Tokenize {

  /** Whitespace word tokens, lowercased. */
  def words(text: String): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    val out = text.toLowerCase.split("\\s+")
    if (out.length == 1 && out(0).isEmpty) Array.empty else out.filter(_.nonEmpty)
  }

  /** Whitespace token count (no allocation of the token array). */
  def wordCount(text: String): Int = {
    if (text == null) return 0
    var n = 0
    var inTok = false
    var i = 0
    while (i < text.length) {
      val ws = Character.isWhitespace(text.charAt(i))
      if (!ws && !inTok) { n += 1; inTok = true }
      else if (ws) inTok = false
      i += 1
    }
    n
  }

  /** BPE-ish subword token estimate: word/number/punct runs, long words
    * charged ceil(len/4) subword units — a deterministic proxy for a real
    * BPE vocab (tokenizer libs are out of scope in this sandbox).
    */
  private val BpeRun = java.util.regex.Pattern.compile("[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\\s]")
  def bpeTokenCount(text: String): Int = {
    if (text == null || text.isEmpty) return 0
    val m = BpeRun.matcher(text)
    var n = 0
    while (m.find()) {
      val len = m.end() - m.start()
      val isWord = Character.isLetter(text.charAt(m.start()))
      n += (if (isWord) (len + 3) / 4 else 1)
    }
    n
  }

  /** Contiguous word n-grams joined by a single space. */
  def wordNgrams(text: String, n: Int): Array[String] = {
    val w = words(text)
    if (w.length < n) {
      if (w.isEmpty) Array.empty else Array(w.mkString(" "))
    } else {
      val out = new Array[String](w.length - n + 1)
      var i = 0
      while (i + n <= w.length) {
        out(i) = w.slice(i, i + n).mkString(" ")
        i += 1
      }
      out
    }
  }

  /** The whitespace-collapsed, lowercased normal form shared by
    * [[charShingles]] and [[shingleHashes]] — ONE definition so the
    * string path and the allocation-free hashing path cannot diverge.
    * Per-char `Character.toLowerCase` is deliberate (vs
    * `String.toLowerCase`): it is locale-free, deterministic, and
    * length-preserving — full-string mappings (U+0130 → "i"+combining
    * dot, Greek final sigma) change lengths/windows and would desync the
    * two paths — and `Character.isWhitespace` covers the Unicode space
    * set the ASCII-only regex `\s+` missed. Identical to the old
    * regex normal form on ASCII text.
    */
  private[text] def normalForm(text: String): String = {
    val buf = new Array[Char](text.length)
    var n = 0
    var pendingSpace = false
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (Character.isWhitespace(c)) { if (n > 0) pendingSpace = true }
      else {
        if (pendingSpace) { buf(n) = ' '; n += 1; pendingSpace = false }
        buf(n) = Character.toLowerCase(c)
        n += 1
      }
      i += 1
    }
    new String(buf, 0, n)
  }

  /** Character k-shingles over the whitespace-normalized, lowercased text. */
  def charShingles(text: String, k: Int): Array[String] = {
    if (text == null) return Array.empty
    val norm = normalForm(text)
    if (norm.isEmpty) Array.empty
    else if (norm.length <= k) Array(norm)
    else {
      val out = new Array[String](norm.length - k + 1)
      var i = 0
      while (i + k <= norm.length) { out(i) = norm.substring(i, i + k); i += 1 }
      out
    }
  }

  /** Hashed char k-shingle set (distinct, sorted), for MinHash input.
    * Allocation-free inner loop: whitespace-normalization and per-window
    * FNV-1a hashing run over a char buffer (no substring objects), dedup by
    * sort — this is the hottest kernel of the signature stage at corpus
    * scale. Produces exactly `hash64(shingle-string)` for each window, so
    * results are identical to hashing `charShingles(text, k)` one by one.
    */
  def shingleHashes(text: String, k: Int): Array[Long] = {
    if (text == null) return Array.empty
    // ONE normal form with charShingles (see [[normalForm]]) — the
    // equivalence below is structural, not re-proven at every edit
    val buf = normalForm(text).toCharArray
    val n = buf.length
    if (n == 0) return Array.empty
    val wins = if (n <= k) 1 else n - k + 1
    val len = math.min(k, n)
    val hs = new Array[Long](wins)
    var w = 0
    while (w < wins) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < len) {
        h ^= buf(w + j).toLong
        h *= 0x100000001b3L
        j += 1
      }
      hs(w) = Hashing.mix64(h)
      w += 1
    }
    java.util.Arrays.sort(hs)
    // in-place dedupe
    var out = 0
    var r = 0
    while (r < hs.length) {
      if (out == 0 || hs(r) != hs(out - 1)) { hs(out) = hs(r); out += 1 }
      r += 1
    }
    java.util.Arrays.copyOf(hs, out)
  }

  /** Exact Jaccard similarity of two token sets. */
  def jaccard(a: Array[String], b: Array[String]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    val sa = a.toSet
    val sb = b.toSet
    val inter = sa.intersect(sb).size
    inter.toDouble / (sa.size + sb.size - inter).toDouble
  }
}
