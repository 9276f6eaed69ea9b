package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 plan evidence dumper: `Test/runMain graft.PlanDump15 <outDir>
  * <suffix> <gate>[,<gate>...] [sfDir]` writes `<outDir>/<gate>_<suffix>.txt`
  * with the `.explain("formatted")` text of each gate's plan.
  *
  * Gates that collect intermediates and return a LocalTableScan verdict row
  * (the planted-contract pattern) get a hand-registered INTERMEDIATE plan —
  * the relation whose shape the optimization claim is about — because the
  * returned DataFrame's plan is just the collected literal. */
object PlanDump15 {

  /** The claim-carrying intermediate for collect-style gates. */
  private def intermediates(
      s: SparkSession, d: String): Map[String, () => DataFrame] = {
    def tbl(n: String) = s.read.parquet(s"$d/$n.parquet")
    def patternedSpec = {
      val docs = tbl("documents").where(col("doc_id") < 385)
        .select(col("doc_id"), length(col("text")).as("n"))
      val base = docs.select(col("doc_id"), col("doc_id").as("pattern_id"),
        col("n"), lit(false).as("perturb"))
      val copies = docs.where(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          col("doc_id").as("pattern_id"), col("n"), lit(true).as("perturb"))
      base.unionByName(copies)
    }
    Map(
      "q205_image_near_dup" -> (() => graft.ops.Multimodal.imageNearDups(
        graft.ops.Multimodal.asPatternedPngMediaTable(patternedSpec),
        maxHamming = 4)),
      "q207_audio_near_dup" -> (() => graft.ops.Multimodal.audioNearDups(
        graft.ops.Multimodal.asPatternedWavMediaTable(patternedSpec),
        maxHamming = 4)),
      "q208_video_near_dup" -> (() => graft.ops.Multimodal.videoNearDups(
        graft.ops.Multimodal.asPatternedGifMediaTable(patternedSpec),
        maxHamming = 4))
    )
  }

  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val outDir = args(0)
    val suffix = args(1)
    val gates = args(2).split(',').toSeq
    val d = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val inter = intermediates(spark, d)
    gates.foreach { g =>
      val df = inter.get(g).map(_.apply())
        .getOrElse(SparkEntry.queries(g)(spark, d))
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${g}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"wrote $outDir/${g}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
