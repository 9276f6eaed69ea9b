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
    val mults = args.drop(1).headOption
      .map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(1, 8))
    for (mult <- mults) {
      val corpus = corpusAt(mult).localCheckpoint()
      val qs = emb0.where(col("vec_id") < 8)
      // warm
      graft.ops.Similarity.cosineTopK(corpus, qs, k = 10)
        .write.format("noop").mode("overwrite").save()
      val tBrute = timed(graft.ops.Similarity.cosineTopK(corpus, qs, k = 10)
        .write.format("noop").mode("overwrite").save())
      // the round-8 formulation, for the record: Window.partitionBy(qid) +
      // row_number shuffles and sorts the FULL |q|x|corpus| scored relation
      import org.apache.spark.sql.expressions.Window
      val q = broadcast(qs.select(col("vec_id").as("qid"), col("embedding").as("qv")))
      val scoredAll = q.join(corpus.select(col("vec_id").as("did"),
          col("embedding").as("dv")), col("qid") =!= col("did"))
        .select(col("qid"), col("did"),
          graft.ops.Portable.round(graft.ops.Similarity.cosine(
            col("qv").cast("array<float>"), col("dv").cast("array<float>")), 4).as("sim"))
        .where(!isnan(col("sim")))
      val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("did").asc)
      val tWindow = timed(scoredAll.withColumn("rank", row_number().over(w))
        .where(col("rank") <= 10)
        .write.format("noop").mode("overwrite").save())
      val positives = qs.select(col("vec_id").as("anchor_id"), col("label").as("__al"))
        .join(emb0.select(col("vec_id").as("pos_id"), col("label").as("__pl")),
          col("__al") === col("__pl")).select("anchor_id", "pos_id")
      val tHn = timed(graft.ops.Similarity.hardNegatives(corpus, qs, positives, k = 10)
        .write.format("noop").mode("overwrite").save())
      println(f"PROFILE_R9 mult=$mult brute_topk=$tBrute%.2f " +
        f"window_topk=$tWindow%.2f hard_negatives=$tHn%.2f")
    }
    // PointBag: 10 point rounds (8 keys each) against growing state — the
    // per-round cost must track the TOUCHED partitions, not the state size
    // (contrast: MutableBag.updateBroadcast scans the state every round)
    for (n <- Seq(100000, 800000)) {
      val pb = graft.api.PointBag(graft.api.DataBag.from(
        spark.range(n.toLong).as[Long].map(i => (i, i))), parts = 32,
        compactEvery = 1000)
      val rnd = new scala.util.Random(7)
      val t0 = System.nanoTime()
      for (_ <- 1 to 10)
        pb.update(Seq.fill(8)((rnd.nextInt(n).toLong, 1L)))(
          (_, old, m) => Some(old.getOrElse(0L) + m))
      val t = (System.nanoTime() - t0) / 1e9
      println(f"PROFILE_R9 pointbag state=$n rounds=10 total=$t%.2f")
    }
    spark.stop()
  }
}
