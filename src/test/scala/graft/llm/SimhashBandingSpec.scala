package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins that [[Dedup.simhashPairs]]'s two candidate schemes — 4×16-bit
  * blocks and Manku C(6,3) combination banding — produce IDENTICAL pair
  * sets (both are pigeonhole-exact for Hamming ≤ 3, so the size-based
  * switch changes cost, never the answer), including planted pairs at
  * exactly the Hamming-3 boundary and a Hamming-4 pair that must NOT
  * appear. */
class SimhashBandingSpec extends SparkTestBase {

  private def pairsOf(fps: Seq[(Long, Long)], manku: Boolean): Set[(Long, Long, Int)] = {
    import spark.implicits._
    val sim = fps.toDF("doc_id", "simhash")
    val rows = Dedup.simhashPairs(sim, manku).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // r17 first-colliding-band emission replaced distinct(): a pair that
    // collides in several bands must still appear EXACTLY once
    assert(rows.length == rows.distinct.length,
      s"duplicate pair emissions (manku=$manku): ${rows.length} rows, ${rows.distinct.length} distinct")
    rows.toSet
  }

  test("4x16 and Manku C(6,3) find the identical Hamming<=3 pair set") {
    val base = 0x5a5a3c3cf0f01234L
    val fps = Seq(
      1L -> base,
      2L -> (base ^ 1L),                       // Hamming 1
      3L -> (base ^ ((1L << 5) | (1L << 20) | (1L << 63))), // Hamming 3 spanning blocks incl. sign bit
      4L -> (base ^ ((1L << 10) | (1L << 11) | (1L << 21) | (1L << 54))), // Hamming 4: excluded
      5L -> ~base,                              // Hamming 64
      // a pair whose 3 errors all land in ONE 16-bit block (4x16's easy
      // case) and spread over 3 of the 6 Manku blocks' boundary bits
      6L -> (base ^ ((1L << 32) | (1L << 43) | (1L << 44))),
      7L -> 0L, 8L -> -1L)
    val narrow = pairsOf(fps, manku = false)
    val wide = pairsOf(fps, manku = true)
    assert(narrow == wide, s"schemes disagree: ${narrow.diff(wide)} vs ${wide.diff(narrow)}")
    val keys = narrow.map { case (a, b, _) => (a, b) }
    assert(keys.contains((1L, 2L)) && keys.contains((1L, 3L)) && keys.contains((1L, 6L)))
    assert(!keys.exists { case (a, b) => (a, b) == ((1L, 4L)) },
      "Hamming-4 pair must be filtered by exact verification")
    assert(narrow.forall(_._3 <= 3))
  }

  test("schemes agree on a pseudo-random corpus with planted near-dups") {
    val rnd = new scala.util.Random(42)
    val planted = (0 until 50).flatMap { g =>
      val fp = rnd.nextLong()
      val errs = rnd.shuffle((0 until 64).toList).take(rnd.nextInt(4)) // 0..3 flips
      Seq((g * 2L) -> fp, (g * 2L + 1) -> errs.foldLeft(fp)((a, b) => a ^ (1L << b)))
    }
    val noise = (1000 until 1200).map(i => i.toLong -> rnd.nextLong())
    val fps = planted ++ noise
    val narrow = pairsOf(fps, manku = false)
    val wide = pairsOf(fps, manku = true)
    assert(narrow == wide)
    assert(narrow.size >= 50, "every planted <=3-flip pair must be found")
  }
}
