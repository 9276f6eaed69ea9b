package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM interleaved A/B of the q156 ingest-loop formulations (r13
  * task 6): OLD = probeIndexed + lazy extendIndex (duplicate batch
  * signatures), NEW = fused Curation.ingestBatch (one signature pass per
  * batch). Interleaved reps cancel host-load windows; mins are the
  * statistic. Run:
  * `sbt "Test/runMain graft.ProfileIngest13 <sfDir> <reps>"`. */
object ProfileIngest13 {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .appName("profile-ingest13").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.{Curation, Dedup}

    def docs: DataFrame = spark.read.parquet(s"$sf/documents.parquet")
    def corpus = docs.where(col("doc_id") % 5 =!= 0 && col("doc_id") % 5 =!= 4)
    def a = docs.where(col("doc_id") % 5 === 0)
    def b = docs.where(col("doc_id") % 5 === 4)

    def old(): Long = {
      val idx0 = Dedup.lshBands(corpus).localCheckpoint()
      val store0 = Dedup.hashedShingles(corpus).localCheckpoint()
      val pairsA = Curation.probeIndexed(idx0, store0, a, minJaccard = 0.2)
      val (idx1, store1) = Curation.extendIndex(idx0, store0, a)
      val pairsB = Curation.probeIndexed(idx1, store1, b, minJaccard = 0.2)
      pairsA.unionByName(pairsB).count()
    }
    def fused(): Long = {
      val idx0 = Dedup.lshBands(corpus).localCheckpoint()
      val store0 = Dedup.hashedShingles(corpus).localCheckpoint()
      val (pairsA, idx1, store1) = Curation.ingestBatch(idx0, store0, a, minJaccard = 0.2)
      val (pairsB, _, _) = Curation.ingestBatch(idx1, store1, b, minJaccard = 0.2)
      pairsA.unionByName(pairsB).count()
    }
    // warm both
    old(); fused()
    var tOld = Vector.empty[Double]
    var tNew = Vector.empty[Double]
    var rows = (0L, 0L)
    (1 to reps).foreach { _ =>
      val t0 = System.nanoTime(); val r1 = old()
      tOld :+= (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); val r2 = fused()
      tNew :+= (System.nanoTime() - t1) / 1e9
      rows = (r1, r2)
    }
    def fmt(v: Vector[Double]) = v.map(t => f"$t%.2f").mkString(" ")
    println(f"rows old=${rows._1} new=${rows._2} (must match)")
    println(f"old : min=${tOld.min}%.2f s  all=[${fmt(tOld)}]")
    println(f"new : min=${tNew.min}%.2f s  all=[${fmt(tNew)}]")
    println(f"ratio(new/old, mins)=${tNew.min / tOld.min}%.3f")
    spark.stop()
  }
}
