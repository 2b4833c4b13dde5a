package graft.media

import graft.imaging.Raster
import graft.text.Hashing

/** Resolves a span's `media_ref` to decoded pixels. Pluggable so tests and
  * benchmarks run without external image bytes while the file-backed
  * implementation covers real corpora (reference test images).
  *
  * Resolution failures are data, not errors: they surface as Left and the
  * signature stage routes them to the bad-record side output (reference
  * behavior: decode errors accumulate off the hot path and never abort the
  * scan, `dedupe.go:41-47,79-85`).
  */
trait MediaResolver extends Serializable {
  def resolve(ref: String): Either[String, Raster]
}

/** file path / file: refs via JDK ImageIO (jpeg/png/gif). */
object FileMedia extends MediaResolver {
  def resolve(ref: String): Either[String, Raster] = {
    val path = if (ref.startsWith("file:")) ref.stripPrefix("file:") else ref
    Raster.decodeFile(path)
  }
}

/** Deterministic synthetic media: `synth://<seed>[?noise=<k>]` renders a
  * smooth 32×32 low-frequency RGB field from the seed; `noise=k` adds a
  * small perturbation of magnitude k (near-duplicate: pHash stays within a
  * few bits). Used by the labeled corpus and the throughput benchmark —
  * exercises the REAL resize+DCT kernels without any image files.
  */
object SynthMedia extends MediaResolver {
  private val Size = 32

  def resolve(ref: String): Either[String, Raster] = {
    if (!ref.startsWith("synth://")) return Left(s"not a synth ref: $ref")
    val body = ref.stripPrefix("synth://")
    val (seedStr, noise) = body.indexOf("?noise=") match {
      case -1 => (body, 0)
      case i => (body.substring(0, i), body.substring(i + 7).toInt)
    }
    Right(render(Hashing.hash64(seedStr), noise))
  }

  /** Smooth field: per channel a sum of 3 seeded 2-D cosine waves, so small
    * perturbations move the DCT hash by only a few bits.
    */
  def render(seed: Long, noise: Int): Raster = {
    val img = Raster(Size, Size)
    val s = Hashing.seeds(seed, 18)
    // noise shifts phases slightly and brightness a touch
    val eps = noise * 0.015
    var c = 0
    while (c < 3) {
      val base = c * 6
      val fx1 = 1 + (java.lang.Long.remainderUnsigned(s(base), 3L)).toInt
      val fy1 = 1 + (java.lang.Long.remainderUnsigned(s(base + 1), 3L)).toInt
      val fx2 = 1 + (java.lang.Long.remainderUnsigned(s(base + 2), 5L)).toInt
      val fy2 = 1 + (java.lang.Long.remainderUnsigned(s(base + 3), 5L)).toInt
      val p1 = (java.lang.Long.remainderUnsigned(s(base + 4), 628L)).toDouble / 100.0 + eps
      val p2 = (java.lang.Long.remainderUnsigned(s(base + 5), 628L)).toDouble / 100.0 - eps
      var y = 0
      while (y < Size) {
        var x = 0
        while (x < Size) {
          val v = 0.5 * math.cos(2 * math.Pi * fx1 * x / Size + p1) *
            math.cos(2 * math.Pi * fy1 * y / Size + p1) +
            0.35 * math.cos(2 * math.Pi * fx2 * x / Size + p2) *
              math.cos(2 * math.Pi * fy2 * y / Size + p2)
          val byteVal = math.max(0, math.min(255, ((v + 1.0) * 127.5 + eps * 20).toInt))
          val i = (y * Size + x) * 4 + c
          img.pix(i) = byteVal.toByte
          x += 1
        }
        y += 1
      }
      c += 1
    }
    // alpha opaque
    var i = 3
    while (i < img.pix.length) { img.pix(i) = 0xff.toByte; i += 4 }
    img
  }
}

/** Scheme-dispatching default resolver. */
object DefaultMedia extends MediaResolver {
  def resolve(ref: String): Either[String, Raster] =
    if (ref == null) Left("null media_ref")
    else if (ref.startsWith("synth://")) SynthMedia.resolve(ref)
    else FileMedia.resolve(ref)
}
