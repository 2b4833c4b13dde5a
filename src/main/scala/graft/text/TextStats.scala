package graft.text

/** Training-data text analysis kernels: language ID, quality scoring,
  * document fingerprinting (winnowing). Graft-added per the build brief —
  * the reference analyzes pixels only.
  */
object TextStats {

  /** Tiny deterministic stopword tables for n-gram/stopword language ID. */
  val StopWords: Map[String, Set[String]] = Map(
    "en" -> Set("the", "a", "and", "of", "to", "in", "is", "it", "that", "for"),
    "de" -> Set("der", "die", "das", "und", "ist", "ein", "nicht", "mit", "von", "zu"),
    "fr" -> Set("le", "la", "et", "les", "des", "un", "une", "est", "dans", "que"),
    "es" -> Set("el", "la", "de", "que", "y", "en", "los", "un", "una", "es"),
    "zh" -> Set.empty // no-latin heuristic below
  )

  /** Heuristic language ID: highest stopword hit-rate wins; CJK codepoint
    * ratio short-circuits to "zh"; ties and no-hits → "und".
    */
  def langId(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    var cjk = 0
    var letters = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (Character.isLetter(c)) {
        letters += 1
        val block = Character.UnicodeBlock.of(c)
        if (block == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS ||
            block == Character.UnicodeBlock.HIRAGANA ||
            block == Character.UnicodeBlock.KATAKANA) cjk += 1
      }
      i += 1
    }
    if (letters > 0 && cjk.toDouble / letters > 0.3) return "zh"
    val toks = Tokenize.words(text)
    if (toks.isEmpty) return "und"
    var best = "und"
    var bestHits = 0
    var tiedAtBest = false
    StopWords.toSeq.sortBy(_._1).foreach { case (lang, sw) =>
      if (sw.nonEmpty) {
        var hits = 0
        var j = 0
        while (j < toks.length) { if (sw.contains(toks(j))) hits += 1; j += 1 }
        if (hits > bestHits) { bestHits = hits; best = lang; tiedAtBest = false }
        else if (hits == bestHits && hits > 0) tiedAtBest = true
      }
    }
    // the documented contract: a TIE at the top is evidence for neither
    // language — "und", not the alphabetically-first contender (which
    // would systematically bias tied multilingual docs toward 'de')
    if (tiedAtBest) "und" else best
  }

  final case class Quality(nChars: Int, nWords: Int, meanWordLen: Double,
                           alphaRatio: Double, punctRatio: Double,
                           stopwordRatio: Double, score: Double)

  /** Quality scoring from cheap surface statistics (length, punctuation,
    * stopword ratios) — Gopher/C4-style heuristics, deterministic.
    */
  def quality(text: String): Quality = {
    if (text == null || text.isEmpty) return Quality(0, 0, 0.0, 0.0, 0.0, 0.0, 0.0)
    var alpha = 0
    var punct = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (Character.isLetter(c)) alpha += 1
      else if (!Character.isWhitespace(c) && !Character.isDigit(c)) punct += 1
      i += 1
    }
    val toks = Tokenize.words(text)
    val nw = toks.length
    val mwl = if (nw == 0) 0.0 else toks.map(_.length).sum.toDouble / nw
    val en = StopWords("en")
    var sw = 0
    toks.foreach(t => if (en.contains(t)) sw += 1)
    val alphaRatio = alpha.toDouble / text.length
    val punctRatio = punct.toDouble / text.length
    val swRatio = if (nw == 0) 0.0 else sw.toDouble / nw
    // linear fusion, clamped to [0,1]: favor alphabetic, stopword-bearing,
    // mid-length-word text; penalize punctuation soup.
    val raw = 0.5 * alphaRatio + 0.3 * math.min(swRatio * 5.0, 1.0) +
      0.2 * (if (mwl >= 3.0 && mwl <= 10.0) 1.0 else 0.0) - 0.5 * punctRatio
    Quality(text.length, nw, mwl, alphaRatio, punctRatio, swRatio,
      math.max(0.0, math.min(1.0, raw)))
  }

  /** Winnowing fingerprint (Schleimer/Wilkerson/Aiken 2003): k-gram rolling
    * hashes, minimum per sliding window of w, distinct mins kept. Robust
    * partial-overlap document fingerprint.
    */
  def winnow(text: String, k: Int = 8, w: Int = 4): Array[Long] = {
    val grams = Tokenize.charShingles(text, k)
    if (grams.isEmpty) return Array.empty
    val hs = grams.map(Hashing.hash64(_))
    if (hs.length <= w) return Array(hs.min)
    val out = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i + w <= hs.length) {
      var m = hs(i)
      var j = i + 1
      while (j < i + w) { if (hs(j) < m) m = hs(j); j += 1 }
      out.add(m)
      i += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    arr
  }
}
