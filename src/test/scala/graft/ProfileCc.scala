package graft

/** Ad-hoc timing for the iterative graph queries under different confs
  * (test scope, not shipped). */
object ProfileCc {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val d = "/root/testdata/sf0.1"
    spark.read.parquet(s"$d/nation.parquet").count()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"TIME $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (aqe <- Seq("true", "false", "true", "false"); q <- Seq("q52_cc_alt", "q31_cc", "q32_tc")) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      time(s"$q aqe=$aqe") {
        SparkEntry.queries(q)(spark, d).write.format("noop").mode("overwrite").save()
      }
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    // graph-size scaling: alternating-star CC at growing vertex counts over
    // the same 600k edge instances (rounds stay O(log n); per-round shuffle
    // carries the distinct edge relation)
    import org.apache.spark.sql.functions._
    for (m <- Seq(53L, 1009L, 10007L)) {
      val e = spark.read.parquet(s"$d/orders.parquet")
        .select((col("o_custkey") % m).as("src"), (col("o_orderkey") % m).as("dst"))
        .where(col("src") =!= col("dst"))
      time(s"cc_alt vertices<=$m") {
        lib.Graphs.connectedComponentsAlternating(e, spark)
          .write.format("noop").mode("overwrite").save()
      }
    }
  }
}
