package graft.functions

/** Band decomposition of the 63-bit SimHash signature — the constants the
  * j10 banded pair join (queries/LlmOps.scala) builds its Column
  * expressions from, factored out so the two load-bearing invariants are
  * property-testable at the JVM level (LawsSpec):
  *
  *   - PIGEONHOLE RECALL: the 5 bands partition the 63 bits, so two
  *     signatures within Hamming distance 4 differ in at most 4 bands and
  *     must agree EXACTLY on at least one — the (band_idx, band_value)
  *     equi-join never drops a true pair.
  *   - EXACTLY-ONCE EMISSION: keeping a candidate only where the joined
  *     band index equals the FIRST index at which the signatures agree
  *     emits each qualifying pair from exactly one band — deduplication as
  *     a map-side filter, no distinct shuffle.
  */
object SimHashBands {

  /** (offset, width) of the 5 bands; widths sum to the 63 signature bits.
    * 13/12-bit bands give 4k–8k distinct keys each — selective enough that
    * band buckets stay bounded as the corpus grows (a 32-bit signature's
    * 6–7-bit bands saturate at ≤128 keys and degrade toward n²/128).
    */
  val defs: Seq[(Int, Int)] =
    Seq((0, 13), (13, 13), (26, 13), (39, 12), (51, 12))

  /** Hamming radius the band count tolerates: ≤ defs.size - 1. */
  val maxHamming: Int = defs.size - 1

  /** Band j of a signature — same shift-and-mask the Column side builds.
    * Signatures are 63-bit nonnegative, so signed shift is exact.
    */
  def value(sig: Long, j: Int): Long = {
    val (off, width) = defs(j)
    (sig >> off) & ((1L << width) - 1)
  }

  /** First band index at which two signatures agree; -1 if none (the pair
    * is not a band candidate and cannot reach the verify filter).
    */
  def firstMatch(sa: Long, sb: Long): Int =
    defs.indices.find(j => value(sa, j) == value(sb, j)).getOrElse(-1)
}
