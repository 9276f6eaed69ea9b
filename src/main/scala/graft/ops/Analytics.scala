package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence analytics over keyed event streams: ordered-funnel
  * completion and cohort retention. Beyond-reference additions — the two
  * workhorse queries of any product/behavioral warehouse, expressed so the
  * heavy lifting stays in one shuffle each.
  *
  * Scale notes (100 TB): `funnel` groups once on the user key and folds each
  * user's (sorted) event list with a higher-order `aggregate` expression —
  * state is a fixed k-slot array, so memory is O(events-per-user) per key
  * and there is exactly ONE shuffle regardless of the number of stages
  * (the per-stage self-join formulation shuffles k times). Per-user event
  * lists are bounded by per-user activity, not data volume; for pathological
  * hot keys pre-aggregate with a (user, day) sub-key first.
  * `retentionCohorts` reduces to distinct (user, day) pairs before anything
  * else — the heavy relation shrinks to active-days — and derives cohorts
  * from that same relation, so the cohort join is co-partitioned on the
  * user key and spends no extra shuffle.
  */
object Analytics {

  /** Ordered funnel: per user, stage j is reached at the first event
    * satisfying `stages(j)._2` with a timestamp STRICTLY after the stage
    * j-1 completion time (stage 0: the first matching event). Returns one
    * row per stage: (stage, users) — how many users completed it in order.
    *
    * `tsCol` must be a totally-ordered numeric/timestamp column; `stages`
    * are (label, predicate-over-event-row) pairs evaluated on `events`'
    * columns before grouping, so any predicate (type match, value floor,
    * property test) works.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val k = stages.length
    val flags = array(stages.map { case (_, p) => p.cast("boolean") }: _*)
    // timestamps compare at microsecond precision (cast("long") would
    // truncate them to epoch seconds and spuriously tie sub-second events)
    val tsKey = events.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(col(tsCol))
      case _ => col(tsCol).cast("long")
    }
    val sorted = events
      .select(col(userCol).as("u"),
        struct(tsKey.as("ts"), flags.as("fl")).as("e"))
      .groupBy("u").agg(sort_array(collect_list("e")).as("es"))
    // fold state: k nullable completion times; an event may complete the
    // first eligible stage whose predecessor was already complete
    val init = array(Seq.fill(k)(lit(null).cast("long")): _*)
    val step = (st: Column, e: Column) =>
      array((0 until k).map { j =>
        val eligible = st.getItem(j).isNull && e("fl").getItem(j) &&
          (if (j == 0) lit(true)
           else st.getItem(j - 1).isNotNull && e("ts") > st.getItem(j - 1))
        when(eligible, e("ts")).otherwise(st.getItem(j))
      }: _*)
    val counts = sorted
      .select(posexplode(aggregate(col("es"), init, step)).as(Seq("i", "t")))
      .where(col("t").isNotNull)
      .groupBy(col("i").cast("int").as("i")).agg(count(lit(1)).as("users"))
    // every stage appears in the output — a stage no user reached reports
    // 0 (matching SQL's COUNT over an empty set), not a missing row
    val spark = events.sparkSession
    import spark.implicits._
    val stageDim = stages.zipWithIndex
      .map { case ((name, _), i) => (i, name) }.toDF("i", "stage")
    // hint the RIGHT (non-preserved) side: the per-stage counts are ≤ K rows
    stageDim.join(broadcast(counts), Seq("i"), "left")
      .select(col("stage"), coalesce(col("users"), lit(0L)).as("users"))
  }

  /** Cohort retention: cohort = first active day per user; one row per
    * (cohort day, day offset) with the distinct users active that day.
    * `dayCol` is the activity-day expression (e.g. `to_date(ts)`).
    */
  def retentionCohorts(events: DataFrame, userCol: String,
      dayCol: Column): DataFrame = {
    val acts = events.select(col(userCol).as("u"), dayCol.as("d")).distinct()
    val firstDay = acts.groupBy("u").agg(min("d").as("cohort"))
    acts.join(firstDay, "u")
      .groupBy(col("cohort"),
        datediff(col("d"), col("cohort")).cast("long").as("day_offset"))
      .agg(countDistinct("u").as("users"))
  }
}
