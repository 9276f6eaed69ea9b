package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Funnel / retention / interval-merge / skyline against hand-computed
  * goldens and seeded brute-force references. */
class AnalyticsSpec extends AnyFlatSpec with Matchers {

  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  behavior of "Analytics.funnel"

  it should "require strictly increasing timestamps across stages" in {
    // user 1 does A,B,C in order; user 2 has B before A (B must not count);
    // user 3 does A and B at the SAME ts (strictness: B must not count)
    val ev = Seq(
      (1L, 10L, "A"), (1L, 20L, "B"), (1L, 30L, "C"),
      (2L, 10L, "B"), (2L, 20L, "A"),
      (3L, 10L, "A"), (3L, 10L, "B")
    ).toDF("u", "ts", "et")
    val got = Analytics.funnel(ev, "u", "ts",
      Seq("a" -> (col("et") === "A"), "b" -> (col("et") === "B"),
        "c" -> (col("et") === "C")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got shouldBe Map("a" -> 3L, "b" -> 1L, "c" -> 1L)
  }

  it should "use the EARLIEST qualifying event per stage (greedy = optimal)" in {
    // taking the later A (ts=30) would miss B; the fold takes A at ts=10
    val ev = Seq((1L, 10L, "A"), (1L, 30L, "A"), (1L, 20L, "B"))
      .toDF("u", "ts", "et")
    val got = Analytics.funnel(ev, "u", "ts",
      Seq("a" -> (col("et") === "A"), "b" -> (col("et") === "B")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got shouldBe Map("a" -> 1L, "b" -> 1L)
  }

  it should "match a brute-force reference on seeded random event logs" in {
    val rnd = new scala.util.Random(42)
    val types = Array("A", "B", "C")
    val events = Seq.fill(600)(
      (rnd.nextInt(30).toLong, rnd.nextInt(50).toLong + 1L,
        types(rnd.nextInt(3))))
    // brute force: per user, earliest A, then earliest B after it, etc.
    def reach(es: Seq[(Long, String)], stages: Seq[String]): Int = {
      var t = Long.MinValue; var done = 0
      for (s <- stages) {
        val nxt = es.filter(e => e._2 == s && e._1 > t).map(_._1)
          .reduceOption(_ min _)
        if (done == stages.indexOf(s) && nxt.isDefined) { done += 1; t = nxt.get }
      }
      done
    }
    val byUser = events.groupBy(_._1).values.toSeq
    val exp = Map(
      "a" -> byUser.count(u => reach(u.map(e => (e._2, e._3)), Seq("A", "B", "C")) >= 1).toLong,
      "b" -> byUser.count(u => reach(u.map(e => (e._2, e._3)), Seq("A", "B", "C")) >= 2).toLong,
      "c" -> byUser.count(u => reach(u.map(e => (e._2, e._3)), Seq("A", "B", "C")) >= 3).toLong)
    val got = Analytics.funnel(events.toDF("u", "ts", "et"), "u", "ts",
      Seq("a" -> (col("et") === "A"), "b" -> (col("et") === "B"),
        "c" -> (col("et") === "C")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got shouldBe exp
  }

  behavior of "Analytics.retentionCohorts"

  it should "count distinct users per (cohort, offset)" in {
    val ev = Seq(
      (1L, "2024-01-01"), (1L, "2024-01-01"), (1L, "2024-01-03"),
      (2L, "2024-01-01"), (2L, "2024-01-02"),
      (3L, "2024-01-02")
    ).toDF("u", "d").select(col("u"), to_date(col("d")).as("d"))
    val got = Analytics.retentionCohorts(ev, "u", col("d"))
      .select(date_format(col("cohort"), "yyyy-MM-dd"), col("day_offset"), col("users"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    got shouldBe Set(
      ("2024-01-01", 0L, 2L), ("2024-01-01", 1L, 1L), ("2024-01-01", 2L, 1L),
      ("2024-01-02", 0L, 1L))
  }
}
