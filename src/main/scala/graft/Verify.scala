package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // same temp placement as Bench (streaming temp checkpoints etc.)
    System.setProperty("java.io.tmpdir", BenchMode.scratchDir)
    val Array(sfDir, outDir) = args.take(2)
    // optional 3rd arg: comma-separated query names to dump (debug aid)
    val only: Set[String] =
      if (args.length > 2) args(2).split(',').toSet else Set.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // same session shape as Bench: AQE may re-coalesce cached fragments
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // same artifact channel as Bench: SparkContext-lifetime addJar for
      // runtime-quotation classes (see Bench.scala)
      .config("spark.sql.artifact.isolation.enabled", "false")
      // same scratch placement as Bench (BenchMode.scratchDir)
      .config("spark.local.dir", BenchMode.scratchDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // The oracle map is static — write it FIRST so a driver-slot timeout
    // mid-run still leaves a comparable artifact for every gate whose
    // parquet landed (the gate loop below writes one dir per query as it
    // goes; only the not-yet-run gates are absent). Same survivability
    // class as Bench's per-query streaming (r13).
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
