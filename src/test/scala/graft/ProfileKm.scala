package graft

/** Ad-hoc repeat timing for the kmeans-family queries (test scope). */
object ProfileKm {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val d = "/root/testdata/sf0.1"
    spark.read.parquet(s"$d/nation.parquet").count()
    for (q <- Seq("q38_kmeans", "q54_ivf_ann", "q27_cosine_topk", "q28_bucketed_ann"); i <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, d).write.format("noop").mode("overwrite").save()
      println(f"TIME $q run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
  }
}
