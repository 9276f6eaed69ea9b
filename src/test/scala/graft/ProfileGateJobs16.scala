package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** r16 probe: per-job wall times of one gate execution.
  * `Test/runMain graft.ProfileGateJobs16 <gate> [sfDir]` */
object ProfileGateJobs16 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val gate = args(0)
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    // warm run (JIT/codegen)
    SparkEntry.queries(gate)(spark, d).write.format("noop").mode("overwrite").save()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val name = js.stageInfos.map(_.name.takeWhile(_ != '\n')).mkString(" | ")
        starts.put(js.jobId, (js.time, name)); ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.get(je.jobId)).foreach { case (t0, name) =>
          println(f"JOB ${je.jobId}%4d ${(je.time - t0) / 1000.0}%7.3f s  ${name.take(150)}")
        }
        ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    val t0 = System.nanoTime()
    SparkEntry.queries(gate)(spark, d).write.format("noop").mode("overwrite").save()
    println(f"GATE_TOTAL ${(System.nanoTime() - t0) / 1e9}%.3f s")
    Thread.sleep(800)
    spark.sparkContext.removeSparkListener(l)
    spark.stop()
  }
}
