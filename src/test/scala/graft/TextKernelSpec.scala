package graft

import graft.text._
import org.scalatest.funsuite.AnyFunSuite

class TextKernelSpec extends AnyFunSuite {

  // Jaro-Winkler parity values pinned from DuckDB 1.0.0
  // jaro_similarity / jaro_winkler_similarity — the driver's oracle engine.
  private val jwCases = Seq(
    ("martha", "marhta", 0.9444444444444445, 0.9611111111111111),
    ("dixon", "dicksonx", 0.7666666666666666, 0.8133333333333332),
    ("jellyfish", "smellyfish", 0.8962962962962964, 0.8962962962962964),
    ("", "abc", 0.0, 0.0),
    ("abc", "abc", 1.0, 1.0),
    ("dwayne", "duane", 0.8222222222222223, 0.8400000000000001),
    ("spark shuffle partition", "spark shuffle partitions",
      0.9861111111111112, 0.9916666666666667),
    ("a", "b", 0.0, 0.0))

  test("jaro + jaro-winkler match the DuckDB oracle values") {
    jwCases.foreach { case (a, b, j, jw) =>
      assert(math.abs(JaroWinkler.jaro(a, b) - j) < 1e-12, s"jaro($a,$b)")
      assert(math.abs(JaroWinkler.jaroWinkler(a, b) - jw) < 1e-12, s"jw($a,$b)")
    }
  }

  test("levenshtein known values") {
    assert(JaroWinkler.levenshtein("martha", "marhta") == 2)
    assert(JaroWinkler.levenshtein("dixon", "dicksonx") == 4)
    assert(JaroWinkler.levenshtein("", "abc") == 3)
    assert(JaroWinkler.levenshtein("abc", "abc") == 0)
  }

  test("tokenizer counts") {
    assert(Tokenize.wordCount("  a  bb\tccc\n") == 3)
    assert(Tokenize.wordCount("") == 0)
    assert(Tokenize.words("The QUICK fox").toSeq == Seq("the", "quick", "fox"))
    assert(Tokenize.bpeTokenCount("hello world") == 2 + 2) // ceil(5/4)=2 each
    assert(Tokenize.bpeTokenCount("a, b") == 1 + 1 + 1)
  }

  test("char shingles and word ngrams") {
    assert(Tokenize.charShingles("ab  cd", 3).toSeq == Seq("ab ", "b c", " cd"))
    assert(Tokenize.wordNgrams("a b c d", 2).toSeq == Seq("a b", "b c", "c d"))
    assert(Tokenize.charShingles("ab", 5).toSeq == Seq("ab"))
  }

  test("minhash estimates jaccard within tolerance and is deterministic") {
    val a = "the quick brown fox jumps over the lazy dog and runs far away tonight"
    val b = "the quick brown fox jumps over the lazy cat and runs far away tonight"
    val sa = MinHash.signature(Tokenize.shingleHashes(a, 5))
    val sb = MinHash.signature(Tokenize.shingleHashes(b, 5))
    val sa2 = MinHash.signature(Tokenize.shingleHashes(a, 5))
    assert(sa.toSeq == sa2.toSeq) // deterministic
    val est = MinHash.estimate(sa, sb)
    val exact = Tokenize.jaccard(Tokenize.charShingles(a, 5), Tokenize.charShingles(b, 5))
    assert(math.abs(est - exact) < 0.15, s"est=$est exact=$exact")
    assert(MinHash.estimate(sa, sa) == 1.0)
  }

  test("minhash LSH bands: near-identical texts share a band, disjoint texts do not") {
    val a = "spark shuffle partition cluster executor driver catalyst codegen " * 4
    val b = a.replace("codegen", "codegen2")
    val c = "entirely different words with zero overlap whatsoever in any shingle " * 4
    val ba = MinHash.bandKeys(MinHash.signature(Tokenize.shingleHashes(a, 5)))
    val bb = MinHash.bandKeys(MinHash.signature(Tokenize.shingleHashes(b, 5)))
    val bc = MinHash.bandKeys(MinHash.signature(Tokenize.shingleHashes(c, 5)))
    assert(ba.toSet.intersect(bb.toSet).nonEmpty)
    assert(ba.toSet.intersect(bc.toSet).isEmpty)
  }

  test("simhash: near texts land close in hamming space, far texts far") {
    val a = "spark shuffle partition cluster executor driver catalyst codegen table row"
    val b = "spark shuffle partition cluster executor driver catalyst codegen table rows"
    val c = "完全 不同 的 文字 without any common tokens here at all believe me truly"
    val ha = SimHash.simhash64(a)
    val hb = SimHash.simhash64(b)
    val hc = SimHash.simhash64(c)
    assert(java.lang.Long.bitCount(ha ^ hb) < 16)
    assert(java.lang.Long.bitCount(ha ^ hc) > 16)
  }

  test("hamming band keys: pigeonhole recall guarantee d < bands") {
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val h = rnd.nextLong()
      val d = rnd.nextInt(16) // < 16 bands ⇒ must share a band
      var h2 = h
      val flipped = scala.collection.mutable.Set.empty[Int]
      while (flipped.size < d) flipped += rnd.nextInt(64)
      flipped.foreach(b => h2 ^= (1L << b))
      val k1 = SimHash.hammingBandKeys(h, 16).toSet
      val k2 = SimHash.hammingBandKeys(h2, 16).toSet
      assert(k1.intersect(k2).nonEmpty,
        s"pair at distance ${flipped.size} must share one of 16 bands")
    }
  }

  test("language id picks stopword-matching language; cjk short-circuit") {
    assert(TextStats.langId("the cat and the dog went to the market for a walk") == "en")
    assert(TextStats.langId("der hund und die katze ist ein tier mit von zu") == "de")
    assert(TextStats.langId("这是一个中文句子 完全没有拉丁字母") == "zh")
    assert(TextStats.langId("") == "und")
    // the documented tie contract: equal top hit counts are evidence for
    // neither language — und, not the alphabetically-first contender
    assert(TextStats.langId("der the") == "und")
    assert(TextStats.langId("le el") == "und")
  }

  test("shingleHashes and charShingles share ONE normal form, incl. non-ASCII") {
    def viaStrings(t: String, k: Int): Set[Long] =
      Tokenize.charShingles(t, k).map(Hashing.hash64(_)).toSet
    // the chars where String.toLowerCase diverges from per-char lowercase:
    // U+0130 (length-changing full mapping) and Greek final sigma
    // (contextual full mapping) — both paths must still agree
    for (t <- Seq("İstanbul İZMİR", "ΣΟΦΟΣ ΛΟΓΟΣ", "plain ascii text",
                  "tab\tand line separators", "  leading and trailing  ")) {
      assert(Tokenize.shingleHashes(t, 7).toSet == viaStrings(t, 7), t)
    }
  }

  test("quality score orders clean text above punctuation soup") {
    val good = TextStats.quality("the quick brown fox jumps over the lazy dog near the river bank")
    val bad = TextStats.quality("@@@ ### !!! $$$ %%% ^^^ &&& *** ((( )))")
    assert(good.score > bad.score)
    assert(good.stopwordRatio > 0)
    assert(bad.punctRatio > 0.5)
  }

  test("winnowing fingerprints: identical text identical, overlap shares prints") {
    val a = "spark shuffle partition cluster executor driver catalyst " * 3
    val fa = TextStats.winnow(a)
    val fa2 = TextStats.winnow(a)
    assert(fa.toSeq == fa2.toSeq)
    val b = a + " appended tail of different content at the very end"
    val fb = TextStats.winnow(b)
    assert(fa.toSet.intersect(fb.toSet).size.toDouble / fa.length > 0.7)
  }

  test("hash64 determinism + seed independence") {
    assert(Hashing.hash64("abc") == Hashing.hash64("abc"))
    assert(Hashing.hash64("abc", 1) != Hashing.hash64("abc", 2))
    assert(Hashing.seeds(42, 8).toSeq == Hashing.seeds(42, 8).toSeq)
  }
}
