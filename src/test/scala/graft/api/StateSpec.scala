package graft.api

import org.apache.spark.sql.SparkSession
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** MutableBag update semantics (reference api/MutableBag.scala:26-51) and
  * Iterate fixpoint behavior. */
class StateSpec extends AnyFlatSpec with Matchers {

  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  "MutableBag.update" should "upsert via Some and skip via None, returning the delta" in {
    val st = MutableBag[Long, Long](DataBag(Seq((1L, 10L), (2L, 20L))))
    val delta = st.update(DataBag(Seq(
      Group(1L, 100L), // existing, f returns None -> unchanged
      Group(2L, 5L),   // existing, updated
      Group(3L, 7L)    // new key, inserted
    ))) { (_, vOpt, m) =>
      vOpt match {
        case Some(v) if m < v => Some(v + m)
        case Some(_)          => None
        case None             => Some(m)
      }
    }
    delta.collect().sorted shouldBe Seq((2L, 25L), (3L, 7L))
    st.bag().collect().sorted shouldBe Seq((1L, 10L), (2L, 25L), (3L, 7L))
  }

  it should "give copy() value semantics" in {
    val st = MutableBag[Long, Long](DataBag(Seq((1L, 1L))))
    val snapshot = st.copy()
    st.update(DataBag(Seq(Group(1L, 9L))))((_, _, m) => Some(m))
    st.bag().collect() shouldBe Seq((1L, 9L))
    snapshot.bag().collect() shouldBe Seq((1L, 1L))
  }

  "Iterate.fixpointBySize" should "converge (doubling then saturating set)" in {
    val init = DataBag(Seq(0))
    val result = Iterate.fixpointBySize(init, maxIter = 20) { cur =>
      cur.flatMap(x => Seq(x, math.min(x + 1, 5))).distinct
    }
    result.collect().sorted shouldBe Seq(0, 1, 2, 3, 4, 5)
  }
}
