package graft

import graft.imaging.PHash
import graft.media.SynthMedia
import graft.text._

object DiagMain {
  def main(args: Array[String]): Unit = {
    // 1. pHash separation between distinct synth seeds
    val hashes = (0 until 60).map(i => PHash.dct64(SynthMedia.render(Hashing.hash64(s"e$i-m0"), 0)))
    val dists = for (i <- hashes.indices; j <- (i + 1) until hashes.length)
      yield java.lang.Long.bitCount(hashes(i) ^ hashes(j))
    println(s"media inter-seed dists: min=${dists.min} p5=${dists.sorted.apply(dists.size/20)} " +
      s"median=${dists.sorted.apply(dists.size/2)} under22=${dists.count(_ < 22)}/${dists.size}")

    // noise dists
    val noiseD = (0 until 30).map { i =>
      val a = PHash.dct64(SynthMedia.render(Hashing.hash64(s"e$i-m0"), 0))
      val b = PHash.dct64(SynthMedia.render(Hashing.hash64(s"e$i-m0"), 2))
      java.lang.Long.bitCount(a ^ b)
    }
    println(s"media noise dists: ${noiseD.sorted.mkString(",")}")

    // 2. text-score separation between entities
    val corpus = graft.synth.Corpus.generate(graft.synth.Corpus.Params(entities = 40, seed = 42))
    val texts = corpus.map(l => (l.label, l.doc.concatText))
    var interMax = 0.0; var intraMin = 1.0
    for (i <- texts.indices; j <- (i + 1) until texts.length) {
      val (la, ta) = texts(i); val (lb, tb) = texts(j)
      val ca = ta.take(512); val cb = tb.take(512)
      val jw = JaroWinkler.jaroWinkler(ca, cb)
      val lev = JaroWinkler.levenshtein(ca, cb).toDouble / math.max(ca.length, cb.length)
      val est = MinHash.estimate(
        MinHash.signature(Tokenize.shingleHashes(ta, 5)),
        MinHash.signature(Tokenize.shingleHashes(tb, 5)))
      val score = 0.5 * jw + 0.3 * (1 - lev) + 0.2 * est
      if (la == lb) intraMin = math.min(intraMin, score)
      else interMax = math.max(interMax, score)
    }
    println(s"text score: intraMin=$intraMin interMax=$interMax (tau=0.67)")

    // simhash prefilter separation
    var interHamMin = 64; var intraHamMax = 0
    for (i <- texts.indices; j <- (i + 1) until texts.length) {
      val (la, ta) = texts(i); val (lb, tb) = texts(j)
      val d = java.lang.Long.bitCount(SimHash.simhash64(ta) ^ SimHash.simhash64(tb))
      if (la == lb) intraHamMax = math.max(intraHamMax, d)
      else interHamMin = math.min(interHamMin, d)
    }
    println(s"simhash: intraMax=$intraHamMax interMin=$interHamMin (prefilter=26)")
  }
}
