package graft.testlib

import graft.api._

/** Fixture for PkgShadowSpec (ADVICE r14): an `@lib` def in a package
  * that has a RELATIVE subpackage named `math` — the bare `math.abs(x)`
  * in the body binds `graft.testlib.math.abs` (x+1) at the definition
  * site, NOT the auto-imported `scala.math`. The splice-site qualifier
  * must therefore keep the fully-qualify ABORT for this def instead of
  * pinning `math` to `_root_.scala.math` (which would silently compute
  * |x| — the exact mis-binding the pkgShadows guard exists to stop). */
@lib object PkgShadowLib {

  private implicit val longEnc: org.apache.spark.sql.Encoder[Long] =
    org.apache.spark.sql.Encoders.scalaLong

  def shifted(xs: DataBag[Long]): Long =
    xs.map(x => math.abs(x)).sum
}
