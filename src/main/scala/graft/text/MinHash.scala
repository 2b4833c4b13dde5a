package graft.text

/** MinHash signatures + LSH banding over hashed shingle sets.
  *
  * Hand-rolled rather than MLlib's MinHashLSH: fully deterministic (seeded
  * multiply-xor permutations), no ML-pipeline ceremony, signature stays a
  * compact Array[Long] column inside the typed Dataset flow
  * (SURVEY.md §2.10, §7.3).
  *
  * Banding math: sig of k values split into b bands of r = k/b rows; two
  * sets with Jaccard s share a given band with prob s^r, some band with
  * prob 1 − (1 − s^r)^b. Defaults k=128, b=16, r=8 put the S-curve midpoint
  * near s ≈ 0.7 — the near-duplicate regime the fused scorer targets.
  */
object MinHash {

  val DefaultK = 128
  val DefaultBands = 16
  val MasterSeed = 0x6772616674L // "graft"

  private val permSeeds: Array[Long] = Hashing.seeds(MasterSeed, DefaultK)

  /** k-value MinHash signature of a hashed-shingle set.
    * Empty input ⇒ all-Long.MaxValue sentinel signature (never matches a
    * non-empty doc's bands because band keys mix the band index).
    */
  def signature(shingles: Array[Long], k: Int = DefaultK): Array[Long] = {
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    // precomputed seed table covers the default k; larger k derives a fresh
    // deterministic table instead of indexing past the cache
    val seeds = if (k <= DefaultK) permSeeds else Hashing.seeds(MasterSeed, k)
    val n = shingles.length
    // permutation-major loop with a 2-way unroll: each (shingle, perm)
    // value is the same one xor + one odd-constant multiply as always
    // (min over the identical value set ⇒ bit-identical signatures), but
    // the running minima live in registers instead of sig(j) loads/stores
    // per value, and two independent min chains overlap in the pipeline —
    // this is the hottest loop of the signature stage (shingles × k ops
    // per doc)
    var j = 0
    while (j + 1 < k) {
      val s0 = seeds(j)
      val s1 = seeds(j + 1)
      var m0 = Long.MaxValue
      var m1 = Long.MaxValue
      var i = 0
      while (i < n) {
        val h = shingles(i)
        val v0 = (h ^ s0) * 0xff51afd7ed558ccdL
        val v1 = (h ^ s1) * 0xff51afd7ed558ccdL
        if (v0 < m0) m0 = v0
        if (v1 < m1) m1 = v1
        i += 1
      }
      sig(j) = m0
      sig(j + 1) = m1
      j += 2
    }
    if (j < k) {
      val s0 = seeds(j)
      var m0 = Long.MaxValue
      var i = 0
      while (i < n) {
        val v0 = (shingles(i) ^ s0) * 0xff51afd7ed558ccdL
        if (v0 < m0) m0 = v0
        i += 1
      }
      sig(j) = m0
    }
    sig
  }

  /** LSH band keys: one 64-bit digest per band (band index mixed in so keys
    * from different bands never collide into one block).
    */
  def bandKeys(sig: Array[Long], bands: Int = DefaultBands): Array[Long] = {
    val r = sig.length / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = Hashing.mix64(0x62616e64L + b)
      var j = b * r
      val end = j + r
      while (j < end) { h = Hashing.hash64(h, sig(j)); j += 1 }
      out(b) = h
      b += 1
    }
    out
  }

  /** Jaccard estimate from two signatures (fraction of agreeing slots). */
  def estimate(a: Array[Long], b: Array[Long]): Double = {
    require(a.length == b.length, "minhash arity mismatch")
    if (a.length == 0) return 0.0
    var agree = 0
    var i = 0
    while (i < a.length) { if (a(i) == b(i)) agree += 1; i += 1 }
    agree.toDouble / a.length.toDouble
  }
}
