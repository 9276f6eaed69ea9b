package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** r16 probe: jobs per StateStore.upsert (meta read + bucket probe + write).
  * `Test/runMain graft.ProfileUpsertJobs` */
object ProfileUpsertJobs {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_upjobs").toString
    graft.ops.StateStore.create(
      (1L to 1000L).map(k => (k, k * 1.0)).toDF("k", "v"), "k", 16, dir)
    val counter = new java.util.concurrent.atomic.AtomicInteger
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        counter.incrementAndGet()
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        println(s"JOB ${js.jobId}: stages=${js.stageInfos.map(_.name).mkString(" | ")} desc=${desc.take(120)}")
      }
    }
    // warm one upsert first (plan/codegen caches), then count
    graft.ops.StateStore.upsert(spark, dir,
      (1L to 50L).map(k => (k, k * 2.0)).toDF("k", "v"))
    spark.sparkContext.addSparkListener(l)
    graft.ops.StateStore.upsert(spark, dir,
      (10L to 60L).map(k => (k, k * 3.0)).toDF("k", "v"))
    Thread.sleep(1000) // listener bus drain
    println(s"JOBS_PER_UPSERT=${counter.get()}")
    spark.sparkContext.removeSparkListener(l)
    spark.stop()
  }
}
