package graft

/** Ad-hoc plan inspector: `Test/runMain graft.PlanDump <gate> [sfDir]`
  * prints the executed plan of one `SparkEntry.queries` entry — the
  * .explain loop for plan-shape work without writing a spec first. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val df = SparkEntry.queries(name)(spark, dir)
    // force AQE final plan, then print
    df.count()
    println(df.queryExecution.executedPlan.toString)
  }
}
