package graft

import org.apache.spark.sql.functions._

/** Scale probe (test scope, not shipped): composite-key vs partial-key
  * derivation for a multi-equality comprehension. Before round 9's change
  * the macro joined on the FIRST equality and post-filtered the second —
  * correct, but the intermediate is |matches on k1 alone|, which explodes
  * when k1 is low-cardinality or skewed. The composite key bounds the
  * intermediate by the TRUE match count. The probe joins two relations on
  * (k1 = 8 values, k2 = high-cardinality) so partial-key matching inflates
  * the intermediate ~|L|x|R|/8 while the composite intermediate stays tiny.
  */
object ProfileCompositeKey {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.api.DataBag
    import graft.api.comprehensions.onSpark
    implicit val s: org.apache.spark.sql.SparkSession = spark

    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val left = DataBag.from(spark.range(n.toLong)
      .select((col("id") % 8).as("k1"), col("id").as("k2"))
      .as[(Long, Long)].map(identity))
    val right = DataBag.from(spark.range(n.toLong)
      .select((col("id") % 8).as("k1"), col("id").as("k2"))
      .as[(Long, Long)].map(identity))

    def timed[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // composite derivation: both equalities key ONE join
    val comp = onSpark {
      for { l <- left; r <- right; if l._1 == r._1; if l._2 == r._2 }
        yield (l._1, l._2)
    }
    comp.ds.write.format("noop").mode("overwrite").save() // warm
    val tComposite = timed(
      comp.ds.write.format("noop").mode("overwrite").save())

    // the pre-change shape, for the record: join on k1 alone (8 values →
    // ~n*n/8 intermediate), post-filter k2
    val partial = left.equiJoin(right)(_._1, _._1)
      .withFilter(p => p._1._2 == p._2._2)
      .map(p => (p._1._1, p._1._2))
    val tPartial = timed(
      partial.ds.write.format("noop").mode("overwrite").save())

    println(f"PROFILE_COMPOSITE n=$n composite=$tComposite%.2f " +
      f"partial_key=$tPartial%.2f ratio=${tPartial / tComposite}%.1f")
  }
}
