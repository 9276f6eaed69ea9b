package graft.api

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** ADVICE r14 (package-shadowed `_root_` pinning): the splice-site
  * qualifier's staticPackage branches pin a bare package root to
  * `_root_.<n>` / `_root_.scala.<n>` ONLY when no enclosing package of
  * the @lib def has a same-named subpackage — a RELATIVE subpackage
  * (`graft.testlib.math` here) outranks the top-level/scala.* binding at
  * the definition site, so the splice must ABORT with the fully-qualify
  * guidance rather than silently re-bind (`math.abs` would flip from the
  * fixture's x+1 to scala.math's |x|). */
class PkgShadowSpec extends AnyFlatSpec with Matchers {

  behavior of "@lib splice-site package qualification"

  it should "ABORT splicing a def whose bare package ref is shadowed by a relative subpackage" in {
    """
    val xs = graft.api.DataBag(Seq(1L, -2L, 3L))
    graft.api.comprehensions.onSpark {
      for { x <- xs; if x > graft.testlib.PkgShadowLib.shifted(xs) } yield x
    }
    """ shouldNot compile
  }

  it should "still pin an UNSHADOWED bare scala.* package (dstat.stddevL's math.sqrt)" in {
    // positive control: graft.lib has no `math` subpackage, so the
    // scala.* pin applies and the spliced stddevL body's math.sqrt works
    // (exercised end-to-end by StatsPipelineSpec and gate q253)
    import graft.api.comprehensions.onSpark
    implicit val spark: org.apache.spark.sql.SparkSession = graft.TestSpark.spark
    import spark.implicits._
    val xs = DataBag(Seq(4.0, 4.0, 4.0))
    val out = onSpark {
      for { x <- xs } yield x + graft.lib.dstat.stddev(xs)
    }
    out.collect().sorted shouldBe Seq(4.0, 4.0, 4.0)
  }
}
