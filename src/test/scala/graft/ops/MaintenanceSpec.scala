package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Specs for the table-maintenance + frequency operators added in round 4:
  * MERGE-style upsert, SCD2 history build, and exact heavy hitters. */
class MaintenanceSpec extends AnyFlatSpec with Matchers {

  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  "Upsert.upsert" should "update matched keys, keep unmatched, insert new" in {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "bal")
    val source = Seq((2L, "B2", 99.0), (9L, "new", 1.0)).toDF("k", "name", "bal")
    val out = Upsert.upsert(target, source, Seq("k")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    out.keySet shouldBe Set(1L, 2L, 3L, 9L)
    out(1L) shouldBe ("a", 10.0)   // unmatched target survives untouched
    out(2L) shouldBe ("B2", 99.0)  // matched: source version wholesale
    out(9L) shouldBe ("new", 1.0)  // unmatched source inserts
  }

  it should "take the source row wholesale even when a source column is null" in {
    val target = Seq((1L, "a")).toDF("k", "name")
    val source = Seq((1L, null.asInstanceOf[String])).toDF("k", "name")
    val out = Upsert.upsert(target, source, Seq("k")).collect()
    out.head.isNullAt(1) shouldBe true // UPDATE SET *, not per-column coalesce
  }

  it should "treat NULL keys null-safely: a NULL-key source row updates a NULL-key target row" in {
    val target = Seq((Some(1L), "a", 10.0), (None, "nullkey", 20.0))
      .toDF("k", "name", "bal")
    val source = Seq((Option.empty[Long], "NULLKEY2", 99.0), (Some(9L), "new", 1.0))
      .toDF("k", "name", "bal")
    val out = Upsert.upsert(target, source, Seq("k")).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) ->
        ((r.getString(1), r.getDouble(2)))).toMap
    out.keySet shouldBe Set(Some(1L), None, Some(9L))
    out(Some(1L)) shouldBe ("a", 10.0)       // untouched
    out(None) shouldBe ("NULLKEY2", 99.0)    // NULL <=> NULL matches: UPDATED, not dropped
    out(Some(9L)) shouldBe ("new", 1.0)      // insert carries SOURCE data, not all-NULLs
  }

  "Upsert.scd2" should "collapse runs into validity intervals" in {
    // user 1: A(1,2) B(3) A(4) — the A at t=4 is a NEW version, not merged
    // back into the first A run; user 2: single open version
    val ev = Seq((1L, "A", 1L), (1L, "A", 2L), (1L, "B", 3L), (1L, "A", 4L),
      (2L, "X", 5L)).toDF("user", "etype", "t")
    val out = Upsert.scd2(ev, "user", "etype", Seq("t"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
      .sortBy(x => (x._1, x._3 == -1L, x._3))
    out shouldBe Array(
      (1L, "A", 1L, 3L), (1L, "B", 3L, 4L), (1L, "A", 4L, -1L),
      (2L, "X", 5L, -1L))
  }

  "HeavyHitters.exactOverThreshold" should "match a plain groupBy-having" in {
    // skewed multiset across several partitions: hot items must survive the
    // per-partition Misra-Gries pass and recount exactly
    val items = spark.range(0, 10000).select(
      when(col("id") % 2 === 0, lit("hot-a"))
        .when(col("id") % 3 === 0, lit("hot-b"))
        .otherwise(concat(lit("cold-"), col("id") % 997)).as("item"))
      .repartition(8)
    val expected = items.groupBy("item").agg(count(lit(1)).as("n"))
      .where(col("n") >= 100).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = HeavyHitters.exactOverThreshold(items, "item", 100L).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    got shouldBe expected
    got.keySet should contain allOf ("hot-a", "hot-b")
  }

  it should "be exact also when everything clears the threshold" in {
    val items = Seq.fill(50)("x").zipWithIndex
      .map { case (s, i) => s + (i % 2) }.toDF("item")
    val got = HeavyHitters.exactOverThreshold(items, "item", 10L).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    got shouldBe Map("x0" -> 25L, "x1" -> 25L)
  }

  "Incremental.mergeAdditive" should "equal the full recompute for any split" in {
    val rows = (1 to 200).map(i => (i % 7L, (i % 13).toLong))
    def agg(rs: Seq[(Long, Long)]) = rs.groupBy(_._1).view
      .mapValues(v => (v.size.toLong, v.map(_._2).sum)).toMap
    val full = agg(rows)
    for (split <- Seq(0, 1, 57, 200)) {
      val (a, b) = rows.splitAt(split)
      def df(rs: Seq[(Long, Long)]) = rs.groupBy(_._1).toSeq
        .map { case (k, v) => (k, v.size.toLong, v.map(_._2).sum) }
        .toDF("k", "n", "s")
      val merged = Incremental.mergeAdditive(df(a), df(b), Seq("k"), Seq("n", "s"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      merged shouldBe full
    }
  }

  "Audit" should "report null rates, duplicate keys, and orphans" in {
    val child = Seq((1L, Some(1.0)), (1L, None), (2L, Some(3.0)), (9L, None))
      .toDF("fk", "v")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val rates = Audit.nullRates(child, Seq("v")).collect().head
    rates.getLong(0) shouldBe 4L
    rates.getDouble(1) shouldBe 0.5
    Audit.keyDuplicates(child, Seq("fk")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe Map(1L -> 2L)
    Audit.referentialOrphans(child, "fk", parent, "pk").collect()
      .map(_.getLong(0)) shouldBe Array(9L)
  }

  "Audit.profile" should "report per-column rows, nulls, and exact distincts in one pass" in {
    val df = Seq((1L, Some("a"), Some(1.0)), (2L, None, Some(1.0)),
      (2L, Some("b"), None), (3L, Some("a"), Some(2.0)))
      .toDF("k", "s", "v")
    val p = Audit.profile(df, exact = true).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    p("k") shouldBe ((4L, 0L, 3L))
    p("s") shouldBe ((4L, 1L, 2L))
    p("v") shouldBe ((4L, 1L, 2L))
    // approx path: same shape, ndv within HLL tolerance on tiny input
    val a = Audit.profile(df).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    a("k") should (be >= 2L and be <= 4L)
    // and the approx plan must NOT contain Spark's Expand (single pass)
    Audit.profile(df).queryExecution.executedPlan.toString should not include "Expand"
  }

  "Audit.schemaDiff" should "report added, removed, and type-changed columns" in {
    val v1 = Seq((1L, "a", 0.5)).toDF("id", "name", "score")
    val v2 = Seq((1.0, "a", true)).toDF("id", "name", "active")
    Audit.schemaDiff(v1, v2).collect()
      .map(r => (r.getString(0), r.getString(1))).sorted shouldBe Array(
      ("active", "added"), ("id", "type_changed:bigint->double"),
      ("score", "removed"))
    Audit.schemaDiff(v1, v1).count() shouldBe 0
  }
}
