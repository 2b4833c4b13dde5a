package graft

import graft.synth.Corpus
import graft.text.{MinHash, Tokenize}

object DiagBands {
  def main(args: Array[String]): Unit = {
    val docs = Corpus.generate(Corpus.Params(entities = 3000, minWords = 150, maxWords = 400)).map(_.doc)
    println(s"docs=${docs.size}")
    val counts = new java.util.HashMap[Long, Int]()
    val bandOf = new java.util.HashMap[Long, Int]()
    docs.foreach { d =>
      val text = d.concatText
      val sh = Tokenize.shingleHashes(text, sys.env.getOrElse("DIAG_K","5").toInt)
      if (sh.nonEmpty) {
        val sig = MinHash.signature(sh)
        val keys = MinHash.bandKeys(sig, 32)
        keys.zipWithIndex.foreach { case (k, bi) =>
          counts.merge(k, 1, (a: Int, b: Int) => a + b)
          bandOf.put(k, bi)
        }
      }
    }
    val top = counts.entrySet().toArray(Array.empty[java.util.Map.Entry[Long, Int]])
      .sortBy(-_.getValue).take(12)
    top.foreach(e => println(s"key=${e.getKey} count=${e.getValue} band=${bandOf.get(e.getKey)}"))
    val pairSum = counts.values().toArray(Array.empty[Integer]).map(c => c.toLong * (c - 1) / 2).sum
    println(s"distinctKeys=${counts.size} pairRows=$pairSum")
    val d0 = docs(0); val d1 = docs(40)
    val s0 = Tokenize.shingleHashes(d0.concatText, sys.env.getOrElse("DIAG_K","5").toInt).toSet
    val s1 = Tokenize.shingleHashes(d1.concatText, sys.env.getOrElse("DIAG_K","5").toInt).toSet
    println(s"shingles0=${s0.size} shingles1=${s1.size} jaccard=${s0.intersect(s1).size.toDouble / s0.union(s1).size}")
    val sig0 = MinHash.signature(Tokenize.shingleHashes(d0.concatText, sys.env.getOrElse("DIAG_K","5").toInt))
    val sig1 = MinHash.signature(Tokenize.shingleHashes(d1.concatText, sys.env.getOrElse("DIAG_K","5").toInt))
    println(s"est=${MinHash.estimate(sig0, sig1)}")
  }
}
