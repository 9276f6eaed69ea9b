package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r15 (VERDICT task 6): 64× scale soak for the r14/r15 quoted-stats
  * aggregate shapes — q253 (two-pass scalar z-score over order dollars)
  * and q255 (per-dim vector stats, d=64, over embeddings). Both are
  * foldAll-shaped aggregations whose driver state is O(1) resp. O(d), so
  * wall time must scale at-or-below the input ratio. Usage:
  *   sbt "Test/runMain graft.ProfileStats15 [sfDir] [N]"
  * Appends measured ratios to stdout; SCALE.md records the numbers. */
object ProfileStats15 {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val n = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .appName("profile-stats-15").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sp: SparkSession = spark

    import graft.api._
    import graft.api.comprehensions.onSpark
    import graft.lib.dstat

    def time[T](label: String)(f: => T): Double = {
      val t0 = System.nanoTime(); val _ = f
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"$label%-28s $secs%7.2f s")
      secs
    }

    // ---- q253 shape: two-pass z-score over whole-dollar order prices
    val orders1 = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), expr("CAST(floor(o_totalprice) AS BIGINT)").as("dollars"))
      .localCheckpoint()
    val ordersN = (0 until n).map(_ => orders1).reduce(_ union _)
      .repartition(32).localCheckpoint()

    def zscore(df: org.apache.spark.sql.DataFrame): Long = {
      val keys = DataBag.from(df.select(col("o_orderkey"), col("dollars"))
        .as[(Long, Long)])
      val dollars = DataBag.from(df.select(col("dollars")).as[Long])
      val res = onSpark {
        for { o <- keys }
          yield (o._1,
            ((o._2 - dstat.meanL(dollars)).toDouble /
              dstat.stddevL(dollars) * 1000.0).floor.toLong)
      }
      res.ds.count()
    }
    println(s"== q253 shape: ${orders1.count()} rows at 1x, ${ordersN.count()} at ${n}x ==")
    val z1 = time("zscore 1x")(zscore(orders1))
    val zN = time(s"zscore ${n}x")(zscore(ordersN))

    // ---- q255 shape: per-dim vector stats (d=64) over micro-unit embeddings
    val emb1 = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(transform(col("embedding"),
        x => floor(x.cast("double") * lit(1000000.0) + lit(0.5)).cast("long"))
        .as("micros"))
      .localCheckpoint()
    val embN = (0 until n).map(_ => emb1).reduce(_ union _)
      .repartition(32).localCheckpoint()

    def vstats(df: org.apache.spark.sql.DataFrame): Long = {
      val vecs = DataBag.from(df.as[Array[Long]])
      val dims = DataBag((0L until 64L).toSeq)
      val res = onSpark {
        for { i <- dims }
          yield (i,
            graft.lib.vstat.mean(64)(vecs)(i.toInt),
            graft.lib.vstat.variance(64)(vecs)(i.toInt),
            graft.lib.vstat.min(64)(vecs)(i.toInt),
            graft.lib.vstat.max(64)(vecs)(i.toInt))
      }
      res.ds.count()
    }
    println(s"== q255 shape: ${emb1.count()} vecs at 1x, ${embN.count()} at ${n}x ==")
    val v1 = time("vstats 1x")(vstats(emb1))
    val vN = time(s"vstats ${n}x")(vstats(embN))

    println(f"ratios at ${n}x: zscore=${zN / z1}%.1f vstats=${vN / v1}%.1f (linear would be <= $n)")
    spark.stop()
  }
}
