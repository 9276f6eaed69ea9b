package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB breakdown of one or more gates (VERDICT r11 task 5: q201,
  * q171/q173/q174) — runs each gate once warm, then once instrumented with
  * a job listener, printing every Spark job's wall time and call site so
  * the dominant fixed costs are attributable. Run:
  * `sbt "Test/runMain graft.ProfileGates12 <sfDir> <gate,gate,...>"`. */
object ProfileGates12 {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(',').toSeq).getOrElse(
      Seq("q171_ann_index", "q173_ann_ingest", "q174_tokenizer_persist",
        "q201_stream_signal_maintenance"))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.ui.enabled", "false")
      .appName("profile-gates12").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (name <- names) {
      val fn = SparkEntry.queries(name)
      // warm once (JIT + codegen + file-index caches)
      fn(spark, sf).write.format("noop").mode("overwrite").save()

      val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      val rows = scala.collection.mutable.ListBuffer.empty[(Long, Double, String)]
      val listener = new SparkListener {
        override def onJobStart(js: SparkListenerJobStart): Unit = {
          val stage = js.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n'))
            .getOrElse("?")
          starts.put(js.jobId, (System.nanoTime(), stage))
        }
        override def onJobEnd(je: SparkListenerJobEnd): Unit = {
          Option(starts.remove(je.jobId)).foreach { case (t0, stage) =>
            rows.synchronized {
              rows += ((t0, (System.nanoTime() - t0) / 1e9, stage)); ()
            }
          }
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sf).write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(300) // let trailing listener events drain
      val chron = rows.sortBy(_._1).toList
      println(f"== $name total=$total%.2f s, jobs=${rows.size} " +
        f"jobTime=${rows.map(_._2).sum}%.2f s ==")
      var prevEnd = t0
      chron.foreach { case (s, dur, stage) =>
        val gap = (s - prevEnd) / 1e9
        if (gap > 0.10) println(f"  -- driver gap $gap%6.3f s --")
        println(f"  +${(s - t0) / 1e9}%6.2f  $dur%6.3f s  ${stage.take(90)}")
        prevEnd = math.max(prevEnd, s + (dur * 1e9).toLong)
      }
      val tailGap = (t0 + (total * 1e9).toLong - prevEnd) / 1e9
      if (tailGap > 0.10) println(f"  -- trailing driver gap $tailGap%6.3f s --")
    }
    spark.stop()
  }
}
