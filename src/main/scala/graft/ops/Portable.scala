package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic numeric helpers.
  *
  * `round(x, n)` half-to-even vs half-away differs between engines; the
  * floor-shift formula below compiles to the identical IEEE-754 op sequence
  * in Spark and in ANSI SQL (`floor(x*10^d + 0.5)/10^d`), so results are
  * bit-identical wherever the input doubles are.
  */
object Portable {
  def round(c: Column, digits: Int): Column = {
    val p = math.pow(10, digits)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }
}
