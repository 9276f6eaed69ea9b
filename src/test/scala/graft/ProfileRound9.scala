package graft

import org.apache.spark.sql.functions._

/** Round-9 scale probes (test scope, not shipped): the bounded-heap
  * ranking path for per-query top-k — brute cosine and hard-negative
  * mining at 1× vs 8× corpus. The former Window formulation shuffled the
  * FULL |queries|×|corpus| scored set; the TopKPerKey path shuffles ≤k
  * candidates per query per partition, so time should track the scoring
  * scan (linear-ish in corpus), never the shuffle. */
object ProfileRound9 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val emb0 = spark.read.parquet(s"$sf/embeddings.parquet")
    def corpusAt(mult: Int) =
      if (mult == 1) emb0
      else (0 until mult).map(i => emb0.select(
          (col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
          col("embedding"), col("label")))
        .reduce(_.unionByName(_))
    def timed[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for (mult <- Seq(1, 8)) {
      val corpus = corpusAt(mult).localCheckpoint()
      val qs = emb0.where(col("vec_id") < 8)
      // warm
      graft.ops.Similarity.cosineTopK(corpus, qs, k = 10)
        .write.format("noop").mode("overwrite").save()
      val tBrute = timed(graft.ops.Similarity.cosineTopK(corpus, qs, k = 10)
        .write.format("noop").mode("overwrite").save())
      val positives = qs.select(col("vec_id").as("anchor_id"), col("label").as("__al"))
        .join(emb0.select(col("vec_id").as("pos_id"), col("label").as("__pl")),
          col("__al") === col("__pl")).select("anchor_id", "pos_id")
      val tHn = timed(graft.ops.Similarity.hardNegatives(corpus, qs, positives, k = 10)
        .write.format("noop").mode("overwrite").save())
      println(f"PROFILE_R9 mult=$mult brute_topk=$tBrute%.2f hard_negatives=$tHn%.2f")
    }
    spark.stop()
  }
}
