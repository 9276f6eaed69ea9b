package graft.api

import org.apache.spark.sql.SparkSession
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.api.comprehensions.onSpark

/** The macro front-end: the guarded two-generator comprehension must PLAN
  * as an equi-join (no cartesian, no per-element re-evaluation) and return
  * exactly what the explicit equiJoin returns; unmatched shapes must pass
  * through unchanged. */
class ComprehensionSpec extends AnyFlatSpec with Matchers {

  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def bagL(s: Seq[Long]): DataBag[Long] = DataBag(s)

  behavior of "comprehensions.onSpark"

  it should "rewrite the equi-guard comprehension to an equiJoin" in {
    val xs = bagL(1L to 50L)
    val ys = bagL(Seq(2L, 4L, 6L, 8L, 10L, 12L))
    val joined = onSpark {
      for { x <- xs; y <- ys; if x % 7 == y % 5 } yield (x, y, x + y)
    }
    val plan = joined.toDF.queryExecution.executedPlan.toString
    plan should not include regex("(?i)cartesian")
    plan should not include regex("(?i)BroadcastNestedLoop")
    val expect = xs.equiJoin(ys)(_ % 7, _ % 5).map(p => (p._1, p._2, p._1 + p._2))
    joined.collect().sorted shouldBe expect.collect().sorted
    // and against the plain Scala semantics of the comprehension
    val seqRef = for { x <- 1L to 50L; y <- Seq(2L, 4L, 6L, 8L, 10L, 12L); if x % 7 == y % 5 }
      yield (x, y, x + y)
    joined.collect().sorted shouldBe seqRef.sorted
  }

  it should "rewrite when the guard sides are swapped" in {
    val xs = bagL(1L to 20L)
    val ys = bagL(1L to 20L)
    val joined = onSpark {
      for { x <- xs; y <- ys; if y % 3 == x % 4 } yield x * 100 + y
    }
    val plan = joined.toDF.queryExecution.executedPlan.toString
    plan should not include regex("(?i)cartesian")
    val seqRef = for { x <- 1L to 20L; y <- 1L to 20L; if y % 3 == x % 4 }
      yield x * 100 + y
    joined.collect().sorted shouldBe seqRef.sorted
  }

  it should "rewrite the unguarded two-generator shape to a cross" in {
    val xs = bagL(1L to 5L)
    val ys = bagL(10L to 12L)
    val crossed = onSpark { for { x <- xs; y <- ys } yield x * 100 + y }
    val seqRef = for { x <- 1L to 5L; y <- 10L to 12L } yield x * 100 + y
    crossed.collect().sorted shouldBe seqRef.sorted
  }

  it should "leave inseparable guards semantically intact" in {
    val xs = bagL(1L to 10L)
    val ys = bagL(1L to 10L)
    // x + y on one side — cannot split into key functions; falls through
    val kept = onSpark {
      for { x <- xs; y <- ys; if x + y == 7L } yield (x, y)
    }
    val seqRef = for { x <- 1L to 10L; y <- 1L to 10L; if x + y == 7L } yield (x, y)
    kept.collect().sorted shouldBe seqRef.sorted
  }

  it should "leave non-DataBag comprehensions untouched" in {
    val r = onSpark { for { x <- Seq(1, 2, 3); y <- Seq(10, 20); if x % 2 == y % 3 } yield x + y }
    r shouldBe (for { x <- Seq(1, 2, 3); y <- Seq(10, 20); if x % 2 == y % 3 } yield x + y)
  }
}
