package graft

import org.apache.spark.sql.SparkSession

/** Prints physical plans for headline queries — plan-quality review tool. */
object ExplainDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else Seq("q12_join5", "q08_groupagg", "q30_jaccard", "q02_filter")
    names.foreach { n =>
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, d).queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
