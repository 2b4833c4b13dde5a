package graft.imaging

/** Perceptual-hash kernels (pure Scala, no Spark): the record-signature
  * functions for media spans.
  *
  * Behavioral spec from the reference (WHAT, not HOW):
  *   - dHash: 9×9 Linear resize → greyscale → row/column gradient bits
  *     (reference `hash/hash.go:53-78`; threshold 10 on the 128-bit pair).
  *   - DCT pHash: 32×32 Linear resize → greyscale → DCT-II → 8×8 low-freq
  *     block offset by +1 (skip DC row/col) → upper-median split → 64 bits
  *     (reference `hash/hash.go:81-155`; threshold 22).
  *
  * The DCT here is the separable O(N³) factorization of the reference's
  * O(N⁴) double loop — identical mathematics, chosen because this kernel
  * runs per-row inside a Dataset.map over up-to-10¹² documents where a 30×
  * constant matters. Golden fixture values in the test suite are locked from
  * this port (the Go binary never runs here; SURVEY.md §7.4.2).
  */
object PHash {

  /** Hamming distance between two 64-bit signatures. */
  @inline def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Sum-of-slots Hamming over equal-arity multi-hash signatures —
    * the metric for dHash's (row, col) pair (reference `vptree/vptree.go:60-69`).
    */
  def hammingMulti(a: Array[Long], b: Array[Long]): Int = {
    require(a.length == b.length, s"signature arity mismatch: ${a.length} vs ${b.length}")
    var s = 0
    var i = 0
    while (i < a.length) { s += java.lang.Long.bitCount(a(i) ^ b(i)); i += 1 }
    s
  }

  /** Default radius thresholds (strict `<`); reference `hash/hash.go:29-39`. */
  val DhashThreshold = 10
  val DctThreshold = 22

  /** dHash: two 64-bit gradient hashes (row-wise, column-wise). */
  def dhash(img: Raster): (Long, Long) = {
    val size = 9
    val small = Resample.resize(img, size, size, Resample.Linear)
    // grey(x)(y) layout: first index is the horizontal coordinate.
    val grey = new Array[Double](size * size)
    var x = 0
    while (x < size) {
      var y = 0
      while (y < size) { grey(size * x + y) = small.grey(x, y); y += 1 }
      x += 1
    }
    var row = 0L
    var col = 0L
    var y = 0
    while (y < size - 1) {
      var x2 = 0
      while (x2 < size - 1) {
        val bit = 1L << ((y * 8) + x2)
        if (grey(size * x2 + y) < grey(size * (x2 + 1) + y)) row |= bit
        if (grey(size * x2 + y) < grey(size * x2 + (y + 1))) col |= bit
        x2 += 1
      }
      y += 1
    }
    (row, col)
  }

  private val N = 32
  private val Region = 8

  // cos((2i+1) * u * π / (2N)) table, flattened as [u][i]; computed once per JVM.
  private val CosTable: Array[Double] = {
    val t = new Array[Double](N * N)
    var u = 0
    while (u < N) {
      var i = 0
      while (i < N) {
        t(u * N + i) = math.cos(((2 * i + 1) * u).toDouble / (2 * N).toDouble * math.Pi)
        i += 1
      }
      u += 1
    }
    t
  }

  /** 64-bit DCT perceptual hash. */
  def dct64(img: Raster): Long = {
    val small = Resample.resize(img, N, N, Resample.Linear)
    val grey = new Array[Double](N * N)
    var i = 0
    while (i < N) {
      var j = 0
      while (j < N) { grey(N * i + j) = small.grey(i, j); j += 1 }
      i += 1
    }

    // Separable DCT-II. Row pass: G[i][v] = Σ_j cos_v(j) f[i][j]
    // (we only ever need u,v in 1..Region, so compute just those bands).
    val bands = Region + 1
    val g = new Array[Double](N * bands) // [i][v], v in 0..Region
    i = 0
    while (i < N) {
      var v = 1
      while (v <= Region) {
        var sum = 0.0
        var j = 0
        while (j < N) { sum += CosTable(v * N + j) * grey(N * i + j); j += 1 }
        g(i * bands + v) = sum
        v += 1
      }
      i += 1
    }
    // Column pass + scaling: F[u][v] = (c_u c_v / 4) Σ_i cos_u(i) G[i][v];
    // c_0 = 1/√2, else 1 — u,v ≥ 1 here so c_u = c_v = 1.
    val freqs = new Array[Double](Region * Region)
    var x = 0
    while (x < Region) {
      val u = x + 1
      var y = 0
      while (y < Region) {
        val v = y + 1
        var sum = 0.0
        var i2 = 0
        while (i2 < N) { sum += CosTable(u * N + i2) * g(i2 * bands + v); i2 += 1 }
        freqs(Region * x + y) = sum / 4.0
        y += 1
      }
      x += 1
    }

    // Upper median of the 64 coefficients; bit n set iff freqs(n) > median.
    val sorted = java.util.Arrays.copyOf(freqs, freqs.length)
    java.util.Arrays.sort(sorted)
    val median = sorted(Region * Region / 2)
    var phash = 0L
    var n = 0
    while (n < freqs.length) {
      if (freqs(n) > median) phash |= 1L << n
      n += 1
    }
    phash
  }

  /** Per-config hash dispatch: DCT ⇒ 1 slot, DHASH ⇒ 2 slots
    * (reference `dedupe.go:21-31`).
    */
  def hashes(img: Raster, useDct: Boolean): Array[Long] =
    if (useDct) Array(dct64(img))
    else { val (r, c) = dhash(img); Array(r, c) }
}
