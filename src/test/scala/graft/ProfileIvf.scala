package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Ad-hoc recall check for the IVF ANN path (test scope, not shipped). */
object ProfileIvf {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val qs = emb.where(col("vec_id") < 8)
      val ivf = Similarity.ivfTopK(emb, qs, k = 3, nlist = 8, nprobe = 2, maxIter = 4)
        .select("qid", "did")
      val brute = Similarity.cosineTopK(emb, qs, k = 3).select("qid", "did")
      val n = ivf.count()
      val hits = ivf.join(brute, Seq("qid", "did"), "left_semi").count()
      println(s"RECALL $sf n=$n hits=$hits recall=${hits.toDouble / 24}")
    }
  }
}
