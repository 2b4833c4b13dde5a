package graft.imaging

import java.awt.image.BufferedImage

/** Non-premultiplied RGBA raster, row-major, 4 bytes per pixel (R,G,B,A).
  *
  * Mirrors the pixel layout the reference engine normalizes every decoded
  * image into before hashing (reference: `utils/resize.go:13-290` scanner →
  * NRGBA), so the hash kernels operate on identical channel semantics.
  */
final class Raster(val width: Int, val height: Int, val pix: Array[Byte]) extends Serializable {
  require(pix.length == width * height * 4 || (width == 0 && height == 0),
    s"raster buffer ${pix.length} != ${width}x${height}x4")

  @inline def r(x: Int, y: Int): Int = pix((y * width + x) * 4) & 0xff
  @inline def g(x: Int, y: Int): Int = pix((y * width + x) * 4 + 1) & 0xff
  @inline def b(x: Int, y: Int): Int = pix((y * width + x) * 4 + 2) & 0xff
  @inline def a(x: Int, y: Int): Int = pix((y * width + x) * 4 + 3) & 0xff

  /** Greyscale by the luminosity approximation over 16-bit premultiplied
    * channels — identical numeric path to the reference's
    * `colorToGrey` (`hash/hash.go:47-50`), which reads Go's
    * `color.Color.RGBA()` (8→16-bit replication, then alpha-premultiply).
    */
  def grey(x: Int, y: Int): Double = {
    val alpha = a(x, y).toLong
    @inline def ch16(v: Int): Long = {
      var c = v.toLong
      c |= c << 8
      c *= alpha
      c / 0xff
    }
    0.299 * ch16(r(x, y)) + 0.587 * ch16(g(x, y)) + 0.114 * ch16(b(x, y))
  }
}

object Raster {
  val empty: Raster = new Raster(0, 0, Array.emptyByteArray)

  def apply(width: Int, height: Int): Raster =
    new Raster(width, height, new Array[Byte](width * height * 4))

  /** Build from packed non-premultiplied RGBA bytes. */
  def fromBytes(width: Int, height: Int, rgba: Array[Byte]): Raster =
    new Raster(width, height, rgba)

  /** Decode an AWT image into RGBA (non-premultiplied, sRGB). */
  def fromBufferedImage(img: BufferedImage): Raster = {
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Byte](w * h * 4)
    val argb = img.getRGB(0, 0, w, h, null, 0, w)
    var i = 0
    while (i < argb.length) {
      val p = argb(i)
      val j = i * 4
      out(j) = ((p >>> 16) & 0xff).toByte
      out(j + 1) = ((p >>> 8) & 0xff).toByte
      out(j + 2) = (p & 0xff).toByte
      out(j + 3) = ((p >>> 24) & 0xff).toByte
      i += 1
    }
    new Raster(w, h, out)
  }

  /** Decode image bytes (jpeg/png/gif — JDK ImageIO) to a raster.
    * Decode failures surface as Left(message): the pipeline treats them as
    * bad-record side output, never as a job abort (reference behavior:
    * `dedupe.go:41-47,79-85` accumulates errors off the hot path).
    */
  def decode(bytes: Array[Byte]): Either[String, Raster] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) Left("unsupported image format")
      else Right(fromBufferedImage(img))
    } catch {
      case e: Exception => Left(s"decode failed: ${e.getMessage}")
    }

  def decodeFile(path: String): Either[String, Raster] =
    try decode(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
    catch { case e: Exception => Left(s"read failed: ${e.getMessage}") }
}
