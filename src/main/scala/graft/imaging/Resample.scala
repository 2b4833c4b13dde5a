package graft.imaging

/** Separable convolution resampler over RGBA rasters.
  *
  * Semantics match the reference's resize stage (reference:
  * `utils/resize.go:309-525`): per-destination-index weight precomputation,
  * alpha-weighted channel accumulation, clamp-to-uint8, horizontal pass then
  * vertical pass. Only the kernels the hash path and its tests exercise are
  * provided (Linear — `hash/hash.go:58,86`; Box + Nearest for the ported
  * golden-pixel fixtures). The reference's remaining 12 filters are dead
  * weight for hash parity and are deliberately not implemented
  * (SURVEY.md §2.2 P2).
  */
object Resample {

  /** support <= 0 means nearest-neighbor special case. */
  final case class Filter(support: Double, kernel: Double => Double)

  val Nearest: Filter = Filter(0.0, _ => 0.0)
  val Box: Filter = Filter(0.5, x => if (math.abs(x) <= 0.5) 1.0 else 0.0)
  val Linear: Filter = Filter(1.0, { x =>
    val ax = math.abs(x)
    if (ax < 1.0) 1.0 - ax else 0.0
  })

  // Precomputed (srcIndex, weight) lists per destination index — hoists all
  // kernel evaluation out of the pixel loops (the reference does the same,
  // `utils/resize.go:309-351`).
  private final class Weights(val offsets: Array[Array[Int]], val weights: Array[Array[Double]])

  private def precompute(dstSize: Int, srcSize: Int, f: Filter): Weights = {
    val du = srcSize.toDouble / dstSize.toDouble
    val scale = math.max(du, 1.0)
    val ru = math.ceil(scale * f.support)
    val offs = new Array[Array[Int]](dstSize)
    val wts = new Array[Array[Double]](dstSize)
    var v = 0
    while (v < dstSize) {
      val fu = (v + 0.5) * du - 0.5
      val begin = math.max(math.ceil(fu - ru).toInt, 0)
      val end = math.min(math.floor(fu + ru).toInt, srcSize - 1)
      val n = math.max(end - begin + 1, 0)
      val io = new Array[Int](n)
      val iw = new Array[Double](n)
      var k = 0
      var sum = 0.0
      var u = begin
      while (u <= end) {
        val w = f.kernel((u - fu) / scale)
        if (w != 0.0) {
          sum += w
          io(k) = u
          iw(k) = w
          k += 1
        }
        u += 1
      }
      val io2 = java.util.Arrays.copyOf(io, k)
      val iw2 = java.util.Arrays.copyOf(iw, k)
      if (sum != 0.0) {
        var i = 0
        while (i < k) { iw2(i) /= sum; i += 1 }
      }
      offs(v) = io2
      wts(v) = iw2
      v += 1
    }
    new Weights(offs, wts)
  }

  def resize(src: Raster, width: Int, height: Int, f: Filter): Raster = {
    if (width < 0 || height < 0) return Raster.empty
    if (width == 0 && height == 0) return Raster.empty
    if (src.width <= 0 || src.height <= 0) return Raster.empty
    if (f.support <= 0) return resizeNearest(src, width, height)
    if (src.width != width && src.height != height)
      resizeVertical(resizeHorizontal(src, width, f), height, f)
    else if (src.width != width) resizeHorizontal(src, width, f)
    else resizeVertical(src, height, f)
  }

  @inline private def clamp(v: Double): Byte = {
    val x = v + 0.5
    if (x >= 255.0) 255.toByte
    else if (x > 0.0) x.toByte
    else 0.toByte
  }

  private def resizeHorizontal(src: Raster, width: Int, f: Filter): Raster = {
    val dst = Raster(width, src.height)
    val ws = precompute(width, src.width, f)
    val sp = src.pix
    val dp = dst.pix
    var y = 0
    while (y < src.height) {
      val rowBase = y * src.width * 4
      val dstBase = y * width * 4
      var x = 0
      while (x < width) {
        var r = 0.0; var g = 0.0; var b = 0.0; var a = 0.0
        val off = ws.offsets(x)
        val wt = ws.weights(x)
        var k = 0
        while (k < off.length) {
          val i = rowBase + off(k) * 4
          val aw = (sp(i + 3) & 0xff).toDouble * wt(k)
          r += (sp(i) & 0xff).toDouble * aw
          g += (sp(i + 1) & 0xff).toDouble * aw
          b += (sp(i + 2) & 0xff).toDouble * aw
          a += aw
          k += 1
        }
        if (a != 0.0) {
          val inv = 1.0 / a
          val j = dstBase + x * 4
          dp(j) = clamp(r * inv)
          dp(j + 1) = clamp(g * inv)
          dp(j + 2) = clamp(b * inv)
          dp(j + 3) = clamp(a)
        }
        x += 1
      }
      y += 1
    }
    dst
  }

  private def resizeVertical(src: Raster, height: Int, f: Filter): Raster = {
    val dst = Raster(src.width, height)
    val ws = precompute(height, src.height, f)
    val sp = src.pix
    val dp = dst.pix
    val stride = src.width * 4
    var x = 0
    while (x < src.width) {
      var y = 0
      while (y < height) {
        var r = 0.0; var g = 0.0; var b = 0.0; var a = 0.0
        val off = ws.offsets(y)
        val wt = ws.weights(y)
        var k = 0
        while (k < off.length) {
          val i = off(k) * stride + x * 4
          val aw = (sp(i + 3) & 0xff).toDouble * wt(k)
          r += (sp(i) & 0xff).toDouble * aw
          g += (sp(i + 1) & 0xff).toDouble * aw
          b += (sp(i + 2) & 0xff).toDouble * aw
          a += aw
          k += 1
        }
        if (a != 0.0) {
          val inv = 1.0 / a
          val j = y * stride + x * 4
          dp(j) = clamp(r * inv)
          dp(j + 1) = clamp(g * inv)
          dp(j + 2) = clamp(b * inv)
          dp(j + 3) = clamp(a)
        }
        y += 1
      }
      x += 1
    }
    dst
  }

  private def resizeNearest(src: Raster, width: Int, height: Int): Raster = {
    if (width == 0 || height == 0) return Raster.empty
    val dst = Raster(width, height)
    val dx = src.width.toDouble / width.toDouble
    val dy = src.height.toDouble / height.toDouble
    var y = 0
    while (y < height) {
      val sy = math.min(((y.toDouble + 0.5) * dy).toInt, src.height - 1)
      var x = 0
      while (x < width) {
        val sx = math.min(((x.toDouble + 0.5) * dx).toInt, src.width - 1)
        val si = (sy * src.width + sx) * 4
        val di = (y * width + x) * 4
        dst.pix(di) = src.pix(si)
        dst.pix(di + 1) = src.pix(si + 1)
        dst.pix(di + 2) = src.pix(si + 2)
        dst.pix(di + 3) = src.pix(si + 3)
        x += 1
      }
      y += 1
    }
    dst
  }
}
