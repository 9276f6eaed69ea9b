package graft.api

import org.apache.spark.sql.SparkSession
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.api.comprehensions.onSpark

/** r15 (VERDICT task 4): opt-in broadcast lowering for `.broadcasted`-
  * hinted guard membership — the reference's broadcast/bag insertion
  * (emma-spark SparkBackend.scala:66-117, SparkNtv.scala:88-97) derived
  * ONLY on the user's explicit hint. Covers: the range-membership lower
  * (exists + forall), hint-sharing across anchors, the retained un-hinted
  * capture abort, and the equality-keyed shape staying a (broadcast)
  * semi-join rather than regressing to a driver collect. */
class BroadcastGuardSpec extends AnyFlatSpec with Matchers {

  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  behavior of ".broadcasted guard membership"

  it should "lower a RANGE membership exists-guard to a broadcast closure and match" in {
    val rows = (1L to 300L).map(i => (i, (i * 37 % 100).toDouble))
    val bandRows = Seq((10L, 30L), (50L, 60L), (95L, 100L))
    val big = DataBag(rows)
    val bands = DataBag(bandRows)
    val out = onSpark {
      for { x <- big
            if bands.broadcasted.exists(b => x._2 >= b._1 && x._2 < b._2) }
        yield x
    }
    val exp = rows.filter(r => bandRows.exists(b => r._2 >= b._1 && r._2 < b._2))
    out.collect().sorted shouldBe exp.sorted
  }

  it should "lower a forall-guard the same way" in {
    val rows = (1L to 120L).map(i => (i, i * 7 % 50))
    val caps = Seq(10L, 25L, 40L)
    val big = DataBag(rows)
    val small = DataBag(caps)
    val out = onSpark {
      // keep rows whose value differs from EVERY cap by more than 2
      for { x <- big
            if small.broadcasted.forall(c => math.abs(x._2 - c) > 2L) }
        yield x
    }
    val exp = rows.filter(r => caps.forall(c => math.abs(r._2 - c) > 2L))
    out.collect().sorted shouldBe exp.sorted
  }

  it should "share ONE BroadcastBag across anchors over the same bag" in {
    val rows = (1L to 100L).map(i => (i, i % 40))
    val caps = Seq(5L, 20L)
    val big = DataBag(rows)
    val small = DataBag(caps)
    val out = onSpark {
      for { x <- big
            if small.broadcasted.exists(c => x._2 > c + 10L) &&
              small.broadcasted.forall(c => x._2 != c) }
        yield x
    }
    val exp = rows.filter(r =>
      caps.exists(c => r._2 > c + 10L) && caps.forall(c => r._2 != c))
    out.collect().sorted shouldBe exp.sorted
  }

  it should "keep the ABORT for the same shape WITHOUT the hint" in {
    """
    val big = graft.api.DataBag(Seq((1L, 2.0)))
    val bands = graft.api.DataBag(Seq((10L, 30L)))
    graft.api.comprehensions.onSpark {
      for { x <- big
            if bands.exists(b => x._2 >= b._1 && x._2 < b._2) }
        yield x
    }
    """ shouldNot compile
  }

  it should "leave equality-keyed membership to the distributed semi-join (no driver collect)" in {
    val rows = (1L to 200L).map(i => (i, i % 23))
    val keys = Seq(3L, 7L, 11L)
    val big = DataBag(rows)
    val small = DataBag(keys)
    val out = onSpark {
      for { x <- big; if small.broadcasted.exists(k => k == x._2) } yield x
    }
    val exp = rows.filter(r => keys.contains(r._2))
    out.collect().sorted shouldBe exp.sorted
    // the hint stays a JOIN hint on the derivable shape: the plan carries
    // a broadcast join, not a collected closure
    val plan = out.ds.queryExecution.executedPlan.toString
    plan should include ("Broadcast")
  }
}
