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
  }
}
