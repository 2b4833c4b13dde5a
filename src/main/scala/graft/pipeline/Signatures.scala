package graft.pipeline

import graft.imaging.PHash
import graft.media.MediaResolver
import graft.model.{Doc, DocSig}
import graft.text.{MinHash, SimHash, Tokenize}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Signature stage: Dataset[Doc] → Dataset[SigResult].
  *
  * One narrow typed map — no shuffle. This is the Spark replacement of the
  * reference's GOMAXPROCS−2 worker pool (`dedupe.go:33-97`): executor
  * parallelism does what the goroutine channel fan-out did, and decode
  * failures ride along as a bad-record side channel instead of the error
  * goroutine (`dedupe.go:79-85`).
  */
object Signatures {

  final case class BadMedia(doc_id: String, media_ref: String, error: String)
  final case class SigResult(sig: DocSig, errors: Seq[BadMedia])

  def derive(docs: Dataset[Doc], cfg: GraftConfig, resolver: MediaResolver)(
      implicit spark: SparkSession): Dataset[SigResult] = {
    import spark.implicits._
    val useDct = cfg.useDct
    val shingleK = cfg.shingleK
    val minhashK = cfg.minhashK
    docs.map { doc =>
      val errs = Seq.newBuilder[BadMedia]
      val media = Array.newBuilder[Long]
      doc.mediaRefs.foreach { ref =>
        resolver.resolve(ref) match {
          case Right(img) => media ++= PHash.hashes(img, useDct)
          case Left(err) => errs += BadMedia(doc.doc_id, ref, err)
        }
      }
      val text = doc.concatText
      val sh = Tokenize.shingleHashes(text, shingleK)
      val minhash =
        if (sh.isEmpty) Array.emptyLongArray else MinHash.signature(sh, minhashK)
      val simhash = if (text.isEmpty) 0L else SimHash.simhash64(text)
      SigResult(
        DocSig(doc.doc_id, media.result(), if (useDct) 1 else 2,
          simhash, minhash, text, Tokenize.wordCount(text)),
        errs.result())
    }
  }
}
