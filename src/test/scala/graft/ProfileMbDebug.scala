package graft

import graft.api._

/** Regression probe for the two MutableBag fixpoint pathologies fixed in
  * round 5 (un-checkpointed delta lineage; checkpoint-carried origin stats
  * compounding — see PROFILE.md): runs ~40 small-delta rounds printing
  * driver heap per round. Healthy: flat ~150 MB, constant round time.
  * Broken: heap doubles per round from ~10 (delta lineage) or planning
  * stalls at ~17 (BigInt stats products). */
object ProfileMbDebug {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    val n = 40L
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDS()
    val und = DataBag.from(edges.union(edges.map(e => (e._2, e._1))).distinct().cache())
    val vertices = und.map(_._1).distinct
    val state = MutableBag(vertices.map(v => (v, v)))
    var delta = state.bag()
    var cnt = delta.size
    var round = 0
    while (cnt > 0 && round < 50) {
      round += 1
      val msgs = delta.equiJoin(und)(_._1, _._1)
        .map { case ((_, lbl), (_, dst)) => (dst, lbl) }
        .foldGroup[Long, Long](_._1, graft.api.alg.Fold(Long.MaxValue, _._2, math.min))
      delta = state.update(msgs) { (_, vOpt, m) =>
        vOpt match {
          case Some(v) if m < v => Some(m)
          case None             => Some(m)
          case _                => None
        }
      }
      cnt = delta.size
      val rt = Runtime.getRuntime
      System.gc()
      println(f"ROUND $round%3d delta=$cnt%5d heapMB=${(rt.totalMemory - rt.freeMemory) / 1e6}%.0f")
    }
    spark.stop()
  }
}
