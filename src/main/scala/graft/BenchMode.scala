package graft

/** Bench-only knobs consulted by a few [[SparkEntry]] gates.
  *
  * `witnesses` — when false (set ONLY by [[Bench]], where it is the
  * DEFAULT since r15; SPARK_GRAFT_BENCH_WITNESS=on restores the old
  * witness-inclusive timing), gates that carry extra contract-witness
  * actions beside their production path (q159's 50-merge encode parity and
  * distributed-train twin, q215's in-memory twin probe) skip the witnesses
  * and report their columns as vacuously true: a bench rep then measures
  * exactly what a production run of the operator costs, while the witnesses
  * keep running — and keep being hash-checked — in Verify, which never
  * touches this flag (default true here = every non-Bench entry point runs
  * witnesses). Bench artifacts stamp the mode as `"witnesses":bool` so a
  * consumer never mistakes vacuous gate columns for verified ones. */
object BenchMode {
  @volatile var witnesses: Boolean = true

  /** Spark scratch (`spark.local.dir`) placement for the Bench/Verify
    * sessions: shuffle files, localCheckpoint disk tier, and broadcast
    * spill all land here, and shuffle scratch bandwidth can be the tighter
    * limit (optimization guide §2.1). Production clusters point this at
    * their fastest node-local storage (NVMe); the sandbox analog is the
    * host tmpfs, so default there when it is writable and fall back to the
    * JVM tmpdir otherwise. `SPARK_GRAFT_LOCAL_DIR` overrides for real
    * deployments. Pure scratch placement — nothing here outlives a run or
    * is ever read as a result (measured r15: shuffle-heavy gates 1.5-2.3×
    * faster vs the disk-backed /tmp default; q62 3.8→1.6 s at sf0.1). */
  def scratchDir: String = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", {
      val shm = java.nio.file.Paths.get("/dev/shm")
      if (java.nio.file.Files.isDirectory(shm) &&
          java.nio.file.Files.isWritable(shm))
        shm.resolve("graft_scratch").toString
      else System.getProperty("java.io.tmpdir")
    })
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    dir
  }
}
