package graft

import org.apache.spark.sql.functions._

/** Scratch probe: PQ recall on the real embeddings table across parameter
  * settings — run with `Test/runMain graft.ProfilePq <sfDir>`. */
object ProfilePq {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = TestSpark.spark
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val qs = emb.where(col("vec_id") < 8)
    val brute = graft.ops.Similarity.cosineTopK(emb, qs, k = 10)
      .select("qid", "did").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (m <- Seq(4, 8); ksub <- Seq(16, 32); rf <- Seq(4, 8, 16)) {
      val cb = graft.ops.Pq.train(emb, m = m, ksub = ksub, maxIter = 4)
      val codes = graft.ops.Pq.encode(cb, emb)
      val adc = graft.ops.Pq.adcTopK(cb, codes, qs, k = 10)
        .select("qid", "did").collect().map(r => (r.getLong(0), r.getLong(1)))
      val rr = graft.ops.Pq.adcTopK(cb, codes, qs, k = 10,
          rerankWith = Some(emb), rerankFactor = rf)
        .select("qid", "did").collect().map(r => (r.getLong(0), r.getLong(1)))
      println(f"[pq] m=$m ksub=$ksub rf=$rf adcRecall=${adc.count(brute.contains) / 80.0}%.3f rerankRecall=${rr.count(brute.contains) / 80.0}%.3f")
    }
    spark.stop()
  }
}
