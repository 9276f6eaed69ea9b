package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole forked test JVM. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.ui.enabled", "false")
      // same artifact channel as the Bench/Verify driver surface: this one
      // session serves EVERY suite in the forked JVM, and session-isolated
      // artifact stores lose runtime-quotation jars to the per-clone cleanup
      // that streaming queries' cloned sessions trigger — later, unrelated
      // tasks then fail fetching "rtqN.jar" (observed: StreamsSpec flaking
      // after RuntimeQuotationSpec). SparkContext-lifetime addJar is immune.
      .config("spark.sql.artifact.isolation.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
