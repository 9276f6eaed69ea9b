package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Specs for the temporal joins (AsOf, RangeJoin) and portable sampling
  * against hand-computed goldens and brute-force references. */
class TemporalSpec extends AnyFlatSpec with Matchers {

  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  behavior of "AsOf.asofJoin"

  it should "match each left row to the latest right row at-or-before" in {
    val trades = Seq((1L, "A", 10L), (2L, "A", 25L), (3L, "B", 5L), (4L, "C", 50L))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq(("A", 5L, 1.0), ("A", 10L, 2.0), ("A", 20L, 3.0),
      ("B", 6L, 9.0), ("C", 50L, 7.0))
      .toDF("sym", "qt", "px")
    val got = AsOf.asofJoin(trades, quotes, Seq("sym"), "t", "qt", Seq("px"))
      .select("trade_id", "r_qt", "r_px")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2)))
      .sortBy(_._1)
    got shouldBe Seq(
      (1L, 10L, 2.0),   // exact-time match counts (at-or-before)
      (2L, 20L, 3.0),   // latest before 25
      (3L, -1L, -1.0),  // no quote at-or-before t=5
      (4L, 50L, 7.0))
  }

  it should "break right-side time ties by the greatest payload" in {
    val l = Seq((1L, "A", 10L)).toDF("id", "k", "t")
    val r = Seq(("A", 10L, 1.0), ("A", 10L, 5.0), ("A", 10L, 3.0))
      .toDF("k", "rt", "v")
    val got = AsOf.asofJoin(l, r, Seq("k"), "t", "rt", Seq("v")).collect()
    got.head.getAs[Double]("r_v") shouldBe 5.0
  }

  it should "ignore null times on both sides" in {
    val l = Seq((1L, "A", Some(10L)), (2L, "A", None))
      .toDF("id", "k", "t")
    val r = Seq(("A", Some(5L), 1.0), ("A", None, 99.0))
      .toDF("k", "rt", "v")
    val got = AsOf.asofJoin(l, r, Seq("k"), "t", "rt", Seq("v"))
      .collect().map(x => (x.getLong(0),
        if (x.isNullAt(4)) -1.0 else x.getDouble(4))).sortBy(_._1)
    // null-time right row (v=99) must never match; null-time left row
    // matches nothing
    got shouldBe Seq((1L, 1.0), (2L, -1.0))
  }

  it should "agree with the brute-force formulation on random data" in {
    val rnd = new scala.util.Random(3)
    val left = (0 until 200).map(i =>
      (i.toLong, s"k${rnd.nextInt(5)}", rnd.nextInt(100).toLong))
    val right = (0 until 300).map(i =>
      (s"k${rnd.nextInt(6)}", rnd.nextInt(100).toLong, i.toLong))
    val l = left.toDF("id", "k", "t")
    val r = right.toDF("k", "rt", "pay")
    val got = AsOf.asofJoin(l, r, Seq("k"), "t", "rt", Seq("pay"))
      .collect().map(x => (x.getLong(0),
        if (x.isNullAt(3)) -1L else x.getLong(3),
        if (x.isNullAt(4)) -1L else x.getLong(4))).sortBy(_._1)
    val expected = left.map { case (id, k, t) =>
      val c = right.filter(q => q._1 == k && q._2 <= t)
      if (c.isEmpty) (id, -1L, -1L)
      else { val m = c.max(Ordering.by((q: (String, Long, Long)) => (q._2, q._3)))
        (id, m._2, m._3) }
    }.sortBy(_._1)
    got shouldBe expected
  }

  behavior of "RangeJoin.intervalJoin"

  it should "agree with the brute-force cross+filter on random data" in {
    val rnd = new scala.util.Random(17)
    val ivs = (0 until 50).map { i =>
      val s = rnd.nextInt(1000).toLong; (i.toLong, s, s + rnd.nextInt(120))
    }
    val pts = (0 until 400).map(i => (i.toLong, rnd.nextInt(1100).toLong))
    val got = RangeJoin.intervalJoin(
        pts.toDF("pid", "t"), ivs.toDF("iv", "s", "e"), "t", "s", "e", 64L)
      .select("pid", "iv").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val expected = (for {
      (pid, t) <- pts; (iv, s, e) <- ivs; if t >= s && t <= e
    } yield (pid, iv)).sorted
    got shouldBe expected
  }

  it should "handle intervals spanning many buckets and empty results" in {
    val ivs = Seq((1L, 0L, 1000L)).toDF("iv", "s", "e") // 100+ buckets at width 8
    val pts = Seq((1L, 500L), (2L, 1001L)).toDF("pid", "t")
    val got = RangeJoin.intervalJoin(pts, ivs, "t", "s", "e", 8L)
      .select("pid").as[Long].collect()
    got shouldBe Array(1L)
  }

  it should "plan as an equi-join on the bucket, never a cartesian" in {
    val ivs = (0 until 100).map(i => (i.toLong, i * 10L, i * 10L + 25L)).toDF("iv", "s", "e")
    val pts = (0 until 1000).map(i => (i.toLong, i.toLong)).toDF("pid", "t")
    val plan = RangeJoin.intervalJoin(pts, ivs, "t", "s", "e", 16L)
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoop"
  }

  it should "plan the as-of join as one shuffle, not a range join" in {
    val l = (0 until 100).map(i => (i.toLong, s"k${i % 5}", i.toLong)).toDF("id", "k", "t")
    val r = (0 until 100).map(i => (s"k${i % 7}", i.toLong, i.toLong)).toDF("k", "rt", "v")
    val plan = AsOf.asofJoin(l, r, Seq("k"), "t", "rt", Seq("v"))
      .queryExecution.executedPlan.toString
    plan should not include "Join" // union + window, no join operator at all
    // exactly one exchange: the window's hash partitioning on the key
    "Exchange hashpartitioning".r.findAllIn(plan).size shouldBe 1
  }

  behavior of "Sampling"

  it should "compute the documented hex thresholds" in {
    Sampling.thresholdHex(0.25) shouldBe "40000000"
    Sampling.thresholdHex(0.0625) shouldBe "10000000"
    Sampling.thresholdHex(0.0) shouldBe "00000000"
    Sampling.thresholdHex(1.0) shouldBe "ffffffff"
  }

  it should "be deterministic and within binomial bounds" in {
    val df = (0L until 4000L).toDF("id")
    val a = Sampling.hashSample(df, col("id"), 0.25).as[Long].collect().sorted
    val b = Sampling.hashSample(df.repartition(13), col("id"), 0.25)
      .as[Long].collect().sorted
    a shouldBe b // partition-layout independent
    // 4000 * 0.25 = 1000 expected; 5 sigma ~ 137
    a.length.toDouble shouldBe 1000.0 +- 140.0
  }

  it should "apply per-stratum fractions and drop unlisted strata" in {
    val df = (0L until 3000L).map(i => (i, if (i % 3 == 0) "x" else if (i % 3 == 1) "y" else "z"))
      .toDF("id", "s")
    val got = Sampling.stratifiedHashSample(df, col("s"), col("id"),
      Map("x" -> 1.0, "y" -> 0.5))
    val counts = got.groupBy("s").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    counts("x") shouldBe 1000L             // fraction 1.0 keeps everything
    counts("y").toDouble shouldBe 500.0 +- 110.0
    counts.get("z") shouldBe None          // unlisted stratum dropped
  }

  behavior of "Sampling.weightedSample"

  /** The A-ES priority recomputed locally with the same arithmetic. */
  private def priority(id: Long, w: Double): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 8)
    val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 4294967296.0
    math.log(u) / w
  }

  it should "select exactly the k largest-priority rows, layout-independent" in {
    val rows = (0L until 2000L).map(i => (i, 1.0 + (i % 7).toDouble))
    val df = rows.toDF("id", "w")
    val got = Sampling.weightedSample(df, col("id"), col("w"), 100)
      .select("id").as[Long].collect().sorted
    val exp = rows.sortBy { case (i, w) => (-priority(i, w), i) }
      .take(100).map(_._1).sorted.toArray
    got shouldBe exp // matches the brute-force A-ES selection exactly
    val again = Sampling.weightedSample(df.repartition(17), col("id"), col("w"), 100)
      .select("id").as[Long].collect().sorted
    again shouldBe exp // partition-layout independent
  }

  it should "favor heavy rows and plan as TakeOrderedAndProject" in {
    // one row carries ~all the weight: it must always be in the sample
    val df = (0L until 500L).map(i => (i, if (i == 271L) 1e9 else 1.0)).toDF("id", "w")
    val ids = Sampling.weightedSample(df, col("id"), col("w"), 10)
      .select("id").as[Long].collect()
    ids should contain(271L)
    val plan = Sampling.weightedSample(df, col("id"), col("w"), 10)
      .queryExecution.executedPlan.toString
    plan should include("TakeOrderedAndProject") // heap top-k, no global sort
  }

  behavior of "Sampling.stratifiedExactKFast"

  it should "select exactly the window formulation's rows via the TopKPerKey operator" in {
    val df = (0L until 400L).map(i => (s"g${i % 5}", i, s"v$i")).toDF("g", "id", "v")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select("g", "id", "v").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val slow = rows(Sampling.stratifiedExactK(df, "g", col("id"), k = 7))
    val fast = rows(Sampling.stratifiedExactKFast(df, "g", col("id"), k = 7))
    fast shouldBe slow
    fast.groupBy(_._1).values.map(_.size).toSet shouldBe Set(7)
    // and the custom physical operator actually planned
    val plan = Sampling.stratifiedExactKFast(df, "g", col("id"), k = 7)
      .queryExecution.executedPlan.toString
    plan should include("TopKPerKey")
  }
}
