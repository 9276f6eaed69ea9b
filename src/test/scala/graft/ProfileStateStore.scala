package graft

import org.apache.spark.sql.functions._

import graft.ops.StateStore

/** Ad-hoc timing for StateStore point updates (test scope, not shipped):
  * the claim under test is that a fixed-size delta's cost is governed by
  * the TOUCHED buckets, not the state size — grow the state 8x with
  * buckets scaled alongside (constant rows per bucket, the production
  * sizing rule) and the point update should stay ~flat, not 8x. */
object ProfileStateStore {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    spark.read.parquet("/root/testdata/sf0.1/nation.parquet").count()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val delta = (1L to 10L).map(k => (k * 7919L, -1.0, false))
      .toDF("k", "v", "del")
    for ((mult, buckets) <- Seq((1, 64), (8, 512)); rep <- 1 to 2) {
      val n = 200000L * mult
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_profss_$mult").toString
      StateStore.create(
        spark.range(n).select(col("id").as("k"), rand(7L).as("v")),
        "k", buckets, dir)
      time(s"upsert 10-key delta state=$n buckets=$buckets rep=$rep") {
        StateStore.upsert(spark, dir, delta, Some("del"))
      }
      time(s"lookup 10 keys state=$n buckets=$buckets rep=$rep") {
        require(StateStore.lookup(spark, dir,
          (1L to 10L).map(_ * 7919L)).count() == 10L)
      }
    }
    spark.stop()
  }
}
