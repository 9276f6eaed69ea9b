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
}
