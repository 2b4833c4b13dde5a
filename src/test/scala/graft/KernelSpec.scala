package graft

import graft.imaging.{PHash, Raster, Resample}
import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference's metric-space + hash fixture tests
  * (`hash/hash_test.go:10-79`) plus seeded property generalizations
  * (FIXTURES.md F1).
  */
class KernelSpec extends AnyFunSuite {

  private def forAll(f: (Long, Long, Long) => Unit): Unit = {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach(_ => f(rnd.nextLong(), rnd.nextLong(), rnd.nextLong()))
  }

  test("hamming identity (hash_test.go:13-20)") {
    assert(PHash.hamming(10L, 10L) == 0)
  }

  test("hamming symmetry (hash_test.go:22-29)") {
    assert(PHash.hamming(0L, 15L) == PHash.hamming(15L, 0L))
  }

  test("hamming triangle inequality (hash_test.go:31-41)") {
    val (a, b, c) = (0L, 15L, 30L)
    assert(PHash.hamming(a, c) <= PHash.hamming(a, b) + PHash.hamming(b, c))
  }

  test("hamming known value H(0x0, 0xf) = 4 (hash_test.go:43-50)") {
    assert(PHash.hamming(0x0L, 0xfL) == 4)
  }

  test("hamming max H(0, 2^64-1) = 64 (hash_test.go:52-59)") {
    assert(PHash.hamming(0L, -1L) == 64)
  }

  test("hamming metric axioms hold for arbitrary longs") {
    forAll { (a, b, c) =>
      assert(PHash.hamming(a, a) == 0)
      assert(PHash.hamming(a, b) == PHash.hamming(b, a))
      assert(PHash.hamming(a, c) <= PHash.hamming(a, b) + PHash.hamming(b, c))
      assert(PHash.hamming(a, b) >= 0 && PHash.hamming(a, b) <= 64)
    }
  }

  test("multi-slot metric sums per-slot hamming and rejects arity mismatch (vptree.go:60-69)") {
    assert(PHash.hammingMulti(Array(0L, 0L), Array(0xfL, 0xf0L)) == 8)
    intercept[IllegalArgumentException] {
      PHash.hammingMulti(Array(0L), Array(0L, 0L))
    }
  }

  private def uniform(w: Int, h: Int, r: Int, g: Int, b: Int, a: Int = 255): Raster = {
    val img = Raster(w, h)
    var i = 0
    while (i < img.pix.length) {
      img.pix(i) = r.toByte; img.pix(i + 1) = g.toByte
      img.pix(i + 2) = b.toByte; img.pix(i + 3) = a.toByte
      i += 4
    }
    img
  }

  test("dhash of uniform white 100x100 is (0, 0) (hash_test.go:61-79)") {
    val (row, col) = PHash.dhash(uniform(100, 100, 255, 255, 255))
    assert(row == 0L && col == 0L)
  }

  test("dct of a uniform image: low-freq block is flat so popcount is small and stable") {
    val h1 = PHash.dct64(uniform(100, 100, 255, 255, 255))
    val h2 = PHash.dct64(uniform(64, 48, 255, 255, 255))
    // uniform fields have identical (all ~0) AC coefficients → same hash
    assert(h1 == h2)
  }

  // --- resize golden-pixel fixtures (FIXTURES.md F3, resize_test.go:37-237) ---

  private def raster(w: Int, h: Int, pix: Array[Int]): Raster =
    Raster.fromBytes(w, h, pix.map(_.toByte))

  test("resize 2x2 -> 1x1 box (resize_test.go:45-62)") {
    val src = raster(2, 2, Array(
      0xff, 0x00, 0x00, 0xff, 0x00, 0xff, 0x00, 0xff,
      0x00, 0x00, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff))
    val out = Resample.resize(src, 1, 1, Resample.Box)
    assert(out.width == 1 && out.height == 1)
    assert(out.pix.map(_ & 0xff).toSeq == Seq(0x80, 0x80, 0x80, 0xff))
  }

  test("resize 2x2 -> 2x2 box is identity (resize_test.go:104-124)") {
    val pix = Array(
      0xff, 0x00, 0x00, 0xff, 0x00, 0xff, 0x00, 0xff,
      0x00, 0x00, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff)
    val out = Resample.resize(raster(2, 2, pix), 2, 2, Resample.Box)
    assert(out.pix.map(_ & 0xff).toSeq == pix.toSeq)
  }

  test("resize 3x1 -> 1x1 nearest picks center pixel (resize_test.go:125-141)") {
    val src = raster(3, 1, Array(
      0xff, 0x00, 0x00, 0xff, 0x00, 0xff, 0x00, 0xff, 0x00, 0x00, 0xff, 0xff))
    val out = Resample.resize(src, 1, 1, Resample.Nearest)
    assert(out.pix.map(_ & 0xff).toSeq == Seq(0x00, 0xff, 0x00, 0xff))
  }

  test("degenerate sizes return empty raster (resize_test.go:189-227)") {
    val src = uniform(2, 2, 1, 2, 3)
    assert(Resample.resize(src, 0, 0, Resample.Box).width == 0)
    assert(Resample.resize(src, -1, 0, Resample.Box).width == 0)
  }

  test("linear resize of a uniform field stays uniform at any size") {
    val out = Resample.resize(uniform(17, 9, 100, 150, 200), 9, 9, Resample.Linear)
    for (x <- 0 until 9; y <- 0 until 9) {
      assert(out.r(x, y) == 100 && out.g(x, y) == 150 && out.b(x, y) == 200)
    }
  }

  test("greyscale uses premultiplied 16-bit luminosity (hash.go:47-50 semantics)") {
    val img = uniform(1, 1, 255, 255, 255)
    // white opaque: each 16-bit channel = 65535 → grey = 65535
    assert(math.abs(img.grey(0, 0) - 65535.0) < 1e-9)
    val half = uniform(1, 1, 255, 255, 255, 128)
    // premultiplied: 65535*128/255 = 32896 (integer div path)
    assert(math.abs(half.grey(0, 0) - (65535L * 128 / 255).toDouble) < 1e-9)
  }
}
