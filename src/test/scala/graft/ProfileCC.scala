package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the alternating-star CC fixpoint (not a test). */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("PROF_CACHED_AQE", "false"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        System.err.println(s"[job] ${e.jobId} end=${e.time}")
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        System.err.println(s"[job] ${e.jobId} start=${e.time} stages=${e.stageInfos.size} " +
          e.stageInfos.map(_.name.takeWhile(_ != ' ')).mkString(","))
    })
    val d = "/root/testdata/sf0.1"
    val e = spark.read.parquet(s"$d/orders.parquet").where(col("o_orderkey") % 3 === 0)
      .select((col("o_custkey") % 53).as("src"), (col("o_orderkey") % 53).as("dst"))
      .where(col("src") =!= col("dst"))
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val r = graft.lib.Graphs.connectedComponentsAlternating(e, spark)
      val t1 = System.nanoTime()
      r.write.format("noop").mode("overwrite").save()
      println(f"[profile] run $i: fixpoint ${(t1 - t0) / 1e9}%.2f s " +
        f"tail ${(System.nanoTime() - t1) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
