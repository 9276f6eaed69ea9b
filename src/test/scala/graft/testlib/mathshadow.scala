package graft.testlib.math

/** Fixture for PkgShadowSpec: a RELATIVE subpackage `math` of
  * `graft.testlib` whose member shadows `scala.math.abs` at
  * [[graft.testlib.PkgShadowLib]]'s definition site (returns x+1, not
  * |x| — a silent wrong answer if the splice ever re-binds the bare
  * `math` to scala.math). */
object abs {
  def apply(x: Long): Long = x + 1L
}
