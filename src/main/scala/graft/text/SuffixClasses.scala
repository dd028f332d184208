package graft.text

/** Suffix prefix-doubling equality classes, shared by the batch exact
  * substring dedup (q315) and its streaming twin (q318).
  *
  * After round j, two positions carry the same 128-bit class pair iff
  * their 2^j-token windows are IDENTICAL (Lee et al. 2022 exact-dedup
  * semantics; the brute-force window-grouping oracles double as the
  * collision check for the mix pair). Windows never cross documents,
  * so the recursion is row-local; suffixes shorter than the window get
  * a unique negative id and stay singletons.
  */
object SuffixClasses {

  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def mix4(a: Long, b: Long, c: Long, d: Long,
                   seed: Long): Long =
    mix(mix(mix(mix(seed ^ a) ^ b) ^ c) ^ d)

  /** Rank-pair arrays after each requested round (window 2^j for
    * j ∈ probes, probes ascending). `hs` are the doc's token hashes. */
  def probeRanks(doc: Long, hs: Array[Long], probes: Seq[Int])
      : Seq[(Int, Array[Long], Array[Long])] = {
    val n = hs.length
    if (n == 0) return probes.map(j =>
      (j, Array.empty[Long], Array.empty[Long]))
    var ra = hs
    var rb = ra.map(h => mix(h ^ 0x5851f42d4c957f2dL))
    val out = scala.collection.mutable
      .ArrayBuffer[(Int, Array[Long], Array[Long])]()
    var k = 1
    var j = 1
    val maxJ = probes.max
    while (j <= maxJ) {
      val na = new Array[Long](n)
      val nb = new Array[Long](n)
      var i = 0
      while (i < n) {
        val (sa, sb) =
          if (i + k < n) (ra(i + k), rb(i + k))
          else { // short suffix: unique id, stays a singleton
            val u = -(doc * 1048576L + i) - 1L
            (u, u)
          }
        na(i) = mix4(ra(i), rb(i), sa, sb, 0x2545f4914f6cdd1dL)
        nb(i) = mix4(ra(i), rb(i), sa, sb, 0x9e6c63d0a9feb4edL)
        i += 1
      }
      ra = na; rb = nb; k <<= 1
      if (probes.contains(j)) out += ((j, ra, rb))
      j += 1
    }
    out.toSeq
  }
}
