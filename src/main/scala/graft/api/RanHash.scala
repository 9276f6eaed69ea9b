package graft.api

/** Position-addressable pseudo-random stream ("Ranhash", Numerical Recipes
  * 3rd ed. §7.1.4 p.352): a stateless 64-bit integer mix applied to
  * `seed + position`, so the draw at ANY absolute position is computable
  * independently without generating the prefix. This is the property the
  * reference's deterministic distributed sample relies on — each element
  * draws at its own global index (emma-language util/RanHash.scala:25-70;
  * emma-spark api/SparkRDD.scala:86-107) — and the arithmetic here
  * reproduces the reference's draws bit-for-bit (same recipe constants,
  * same signed shifts, same [0,1) mapping), so same-seed samples are
  * emma-identical.
  */
final class RanHash private (val seed: Long, private var pos: Long)
    extends Serializable {

  /** Jump to an absolute stream position. */
  def at(p: Long): RanHash = { pos = p; this }

  /** Advance by `n` positions without drawing. */
  def skip(n: Long): RanHash = { pos += n; this }

  /** Uniform draw in [0, 1) at the current position; advances by one. */
  def next(): Double = {
    var x = seed + pos
    x = 3935559000370003845L * x + 2691343689449507681L
    x = x ^ (x >> 21)
    x = x ^ (x << 37)
    x = x ^ (x >> 4)
    x = 4768777513237032717L * x
    x = x ^ (x << 20)
    x = x ^ (x >> 41)
    x = x ^ (x << 5)
    pos += 1
    x * RanHash.TwoPowNeg64 + 0.5
  }

  def nextInt(k: Int): Int = math.floor(next() * k).toInt

  def nextLong(k: Long): Long = math.floor(next() * k).toLong
}

object RanHash {
  // 2^-64: maps the signed 64-bit mix into [-0.5, 0.5), then +0.5 → [0, 1)
  private val TwoPowNeg64 = 5.4210108624275221700e-20

  /** `substream` carves disjoint position ranges out of one seed (the
    * reference's substream offset: seed + substream · 2^55). */
  def apply(seed: Long, substream: Int = 0): RanHash =
    new RanHash(seed + substream * (2L << 54), 0L)
}
