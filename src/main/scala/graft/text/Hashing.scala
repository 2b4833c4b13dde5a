package graft.text

/** Deterministic 64-bit hashing primitives shared by the text signature
  * kernels (MinHash, SimHash, fingerprints, salting).
  *
  * Everything is seeded and wall-clock-free: determinism is a pipeline
  * invariant (SURVEY.md §7.4.5 — the reference's only nondeterminism, the
  * random VP-tree vantage point, is exactly what the graft removes).
  */
object Hashing {

  /** splitmix64 finalizer — strong avalanche, public-domain construction. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64 over UTF-16 code units, finalized with splitmix64. */
  def hash64(s: String, seed: Long = 0L): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  /** Hash of a (Long, Long) pair — band keys, edge digests. */
  @inline def hash64(a: Long, b: Long): Long = mix64(mix64(a) ^ b)

  /** Derive k independent sub-seeds from a master seed. */
  def seeds(master: Long, k: Int): Array[Long] = {
    val out = new Array[Long](k)
    var s = master
    var i = 0
    while (i < k) { s = mix64(s); out(i) = s; i += 1 }
    out
  }
}
