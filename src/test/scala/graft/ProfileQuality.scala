package graft

import org.apache.spark.sql.functions._

/** Scratch probe: quality-model separation on the documents table. */
object ProfileQuality {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = TestSpark.spark
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val suffix = " " + ("zzz " * 60) + ("000 111 222 333 444 555 666 777 888 999 " * 3)
    val labeled = docs.select(col("doc_id"),
      when(col("doc_id") % 3 === 0, concat(col("text"), lit(suffix)))
        .otherwise(col("text")).as("text"),
      (col("doc_id") % 3 =!= 0).cast("int").as("y"))
    // feature means per class
    val f = graft.ops.Quality.features(labeled, "doc_id", "text")
      .join(labeled.select(col("doc_id").as("id"), col("y")), "id")
    val means = f.select(col("y"), posexplode(col("x")).as(Seq("d", "v")))
      .groupBy("y", "d").agg(avg("v").as("m")).orderBy("y", "d").collect()
    means.groupBy(_.getInt(0)).toSeq.sortBy(_._1).foreach { case (y, rows) =>
      println(s"[q] y=$y means = " + rows.sortBy(_.getInt(1))
        .map(r => f"${r.getDouble(2)}%.3f").mkString(", "))
    }
    for (iters <- Seq(15, 20, 30); lr <- Seq(8.0, 16.0, 32.0)) {
      val train = labeled.where(col("doc_id") % 5 =!= 0)
      val test = labeled.where(col("doc_id") % 5 === 0)
      val model = graft.ops.Quality.train(train,
        train.select(col("doc_id").as("id"), col("y")), "doc_id", "text",
        iters = iters, lr = lr)
      val scored = graft.ops.Quality.score(test, model, "doc_id", "text")
      val r = scored.agg(count(lit(1)),
        sum(((col("quality") >= 0.5).cast("int") === col("y")).cast("long"))).head()
      println(s"[q] iters=$iters lr=$lr acc = ${r.getLong(1)}/${r.getLong(0)}" +
        s" w=${model._1.map(x => f"$x%.2f").mkString(",")} b=${f"${model._2}%.2f"}")
    }
    spark.stop()
  }
}
