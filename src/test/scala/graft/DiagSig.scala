package graft
import graft.synth.Corpus
import graft.text.{MinHash, SimHash, Tokenize}
import graft.imaging.PHash
import graft.media.SynthMedia
import java.util.concurrent.Executors
object DiagSig {
  def main(args: Array[String]): Unit = {
    val docs = Corpus.generate(Corpus.Params(entities = 30000, seed = 42)).map(_.doc)
    println(s"docs=${docs.size}")
    def sigOne(d: graft.model.Doc): Long = {
      var acc = 0L
      d.mediaRefs.foreach { ref =>
        SynthMedia.resolve(ref).foreach(img => acc ^= PHash.dct64(img))
      }
      val text = d.concatText
      val sh = Tokenize.shingleHashes(text, 5)
      if (sh.nonEmpty) acc ^= MinHash.signature(sh, 128)(0)
      acc ^= SimHash.simhash64(text)
      acc + Tokenize.wordCount(text)
    }
    for (threads <- Seq(1, 8, 32)) {
      val pool = Executors.newFixedThreadPool(threads)
      val chunks = docs.grouped(math.max(docs.size / (threads * 4), 1)).toSeq
      val t0 = System.nanoTime()
      val futs = chunks.map(c => pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = c.map(sigOne).sum
      }))
      val sink = futs.map(_.get()).sum
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"threads=$threads wall=$sec%.2f s docs/s=${docs.size / sec}%.0f sink=${sink % 10}")
      pool.shutdown()
    }
  }
}
