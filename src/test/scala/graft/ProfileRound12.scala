package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 soak: IVF-PQ build under the TRAIN-SET CAP (VERDICT r11
  * task 6). ProfileRound11 measured the uncapped build at 39.5× for 64×
  * data — honest linear k-means training, but nobody trains a coarse
  * quantizer on every vector of a 100-TB corpus. This run compares, on the
  * SAME 64× corpus (id-shifted replicas):
  *   - capped build+probe (auto cap = max(256·k, 65536) train rows) vs
  *   - uncapped build+probe (trainCap = Long.MaxValue, the r11 behavior)
  * and reports the capped 1×→64× ratio plus probe AGREEMENT between the
  * two builds (rerank makes ties exact-vector-scored, so agreement is the
  * recall-preservation signal). Run:
  * `sbt "Test/runMain graft.ProfileRound12 [sfDir] [N]"`. */
object ProfileRound12 {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .appName("profile-round12").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding")
    val maxVec = emb.agg(max("vec_id")).head().getLong(0) + 1
    def embX(k: Int): DataFrame = (0 until k).map(i =>
      emb.select((col("vec_id") + lit(i * maxVec)).as("vec_id"), col("embedding")))
      .reduce(_ unionByName _).repartition(32).localCheckpoint()
    val emb1 = embX(1)
    val embN = embX(n)
    val queries = emb.limit(8).localCheckpoint()
    println(s"== ${emb1.count()} vecs at 1x, ${embN.count()} at ${n}x ==")

    def time(label: String)(f: => Long): Double = {
      val t0 = System.nanoTime(); val rows = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"TIME $label%-30s $s%8.2f s  rows=$rows")
      s
    }

    val p1 = time("ivfpq capped build+probe 1x") {
      val idx = ops.PqIndex.build(emb1)
      ops.PqIndex.probe(idx, queries).count()
    }
    var cappedN: DataFrame = null
    val pN = time(s"ivfpq capped build+probe ${n}x") {
      val idx = ops.PqIndex.build(embN)
      cappedN = ops.PqIndex.probe(idx, queries).localCheckpoint()
      cappedN.count()
    }
    var fullN: DataFrame = null
    val fN = time(s"ivfpq UNCAPPED build+probe ${n}x") {
      val idx = ops.PqIndex.build(embN, trainCap = Long.MaxValue)
      fullN = ops.PqIndex.probe(idx, queries).localCheckpoint()
      fullN.count()
    }

    // probe agreement capped vs uncapped: fraction of (qid, did) pairs of
    // the UNCAPPED probe that the capped probe also returns
    val cap = cappedN.select("qid", "did").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = fullN.select("qid", "did").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val agree = if (full.isEmpty) 1.0
      else cap.intersect(full).size.toDouble / full.size

    println(f"RATIOS capped ${n}x/1x = ${pN / p1}%.1f (r11 uncapped was 39.5); " +
      f"uncapped-on-same-tree = ${fN / p1}%.1f; probe agreement = $agree%.3f " +
      s"(linear would be <= $n)")
    spark.stop()
  }
}
