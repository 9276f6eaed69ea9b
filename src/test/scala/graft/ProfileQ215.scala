package graft

import org.apache.spark.sql.functions._

/** Phase timing for the q215 lifecycle gate (test scope, not shipped). */
object ProfileQ215 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def timed[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"Q215PROF $tag%-14s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    val qs = emb.where(col("vec_id") < 8)
    val copies = qs.crossJoin(Seq(1, 2, 3).toDF("j"))
      .select((lit(2000000L) + col("vec_id") * 10 + col("j")).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x + ((col("vec_id") * 5 + col("j") * 7 + i) % 5).cast("float") * lit(0.001f))
          .as("embedding"),
        lit(0).as("label"))
    val corpus = emb.unionByName(copies)
    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      val coarse = timed("coarse_kmeans") {
        graft.lib.KMeans.centroids(corpus, 8, 4) }
      val cb = timed("pq_train") { graft.ops.Pq.train(corpus, 8, 16, 4) }
      val idx = timed("encode") {
        val i = graft.ops.PqIndex.IvfPq(coarse, cb,
          graft.ops.PqIndex.encodeWithCell(cb, coarse, corpus, "vec_id", "embedding"))
        i.codes.count(); i }
      val dir = java.nio.file.Files.createTempDirectory("q215prof").toString
      timed("save") { graft.ops.PqIndex.save(idx, dir) }
      val loaded = timed("load") { graft.ops.PqIndex.load(spark, dir) }
      timed("probe_loaded") {
        graft.ops.PqIndex.probe(loaded, qs, 10, 4, Some(corpus), 4).collect() }
      timed("probe_mem") {
        graft.ops.PqIndex.probe(idx, qs, 10, 4, Some(corpus), 4).collect() }
    }
    spark.stop()
  }
}
