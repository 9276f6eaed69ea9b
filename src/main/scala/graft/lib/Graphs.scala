package graft.lib

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.api.{DataBag, Group, Iterate, MutableBag}

/** Graph algorithms over edge bags (reference: `DataBag[Edge[V]]`,
  * emma-lib graphs/transitiveClosure.scala:22-44,
  * emma-examples graphs/ConnectedComponents.scala:27-53,
  * graphs/EnumerateTriangles.scala:27-42). Original Spark-first
  * implementations: edges are Datasets, fixpoints run through
  * [[graft.api.Iterate]] (persist + lineage truncation per step).
  */
object Graphs {

  /** Connected components by min-label propagation over undirected edges.
    * Returns (vertex, label) with label = min vertex id in the component.
    *
    * Scale notes: each iteration is one shuffle (join on vertex) + one
    * aggregation; state is persisted and lineage-truncated per step. At
    * cluster scale, pre-partition both sides by vertex to make the join
    * co-located across iterations.
    */
  def connectedComponents(edges: DataFrame, spark: SparkSession): DataFrame = {
    // undirected closure of the edge set
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().persist()
    val init = und.select(col("src").as("vertex")).distinct()
      .withColumn("label", col("vertex"))
    val result = Iterate.fixpoint[org.apache.spark.sql.Row](init)(
      step = cur => {
        // propagate each vertex's label to its neighbors; keep the min
        val prop = cur.as("c").join(und.as("e"), col("c.vertex") === col("e.src"))
          .select(col("e.dst").as("vertex"), col("c.label").as("label"))
        cur.union(prop).groupBy("vertex").agg(min("label").as("label"))
      })(
      converged = (prev, next) => {
        // converged when no label changed
        next.as("n").join(prev.as("p"), col("n.vertex") === col("p.vertex"))
          .where(col("n.label") =!= col("p.label")).isEmpty
      })
    und.unpersist()
    result
  }

  /** Transitive closure by path doubling: p ← p ∪ (p ⋈ p), reaching paths of
    * length 2^i after i rounds — O(log diameter) shuffles instead of the
    * reference's O(diameter) edge-join do-while
    * (transitiveClosure.scala:22-44); same fixpoint-by-size convergence. */
  def transitiveClosure(edges: Dataset[(Long, Long)]): Dataset[(Long, Long)] = {
    import edges.sparkSession.implicits._
    val bag = Iterate.fixpointBySize(DataBag.from(edges)) { cur =>
      val next = cur.equiJoin(cur)(_._2, _._1)
        .map { case ((s, _), (_, d)) => (s, d) }
      cur.union(next).distinct
    }
    bag.ds
  }

  /** Triangle enumeration via two joins over ordered edges (src < dst),
    * reference EnumerateTriangles.scala:27-42. Returns (x, y, z) with
    * x < y < z, each triangle once. */
  def triangles(edges: DataFrame): DataFrame = {
    val e = edges.select(
        least(col("src"), col("dst")).as("s"), greatest(col("src"), col("dst")).as("d"))
      .where(col("s") =!= col("d")).distinct().persist()
    val xy = e.as("xy"); val yz = e.as("yz"); val xz = e.as("xz")
    xy.join(yz, col("xy.d") === col("yz.s"))
      .join(xz, col("xz.s") === col("xy.s") && col("xz.d") === col("yz.d"))
      .select(col("xy.s").as("x"), col("xy.d").as("y"), col("yz.d").as("z"))
  }

  /** Connected components via keyed mutable state ([[MutableBag]]) — the
    * reference's formulation (ConnectedComponents.scala:27-53): seed state
    * with vertex→vertex, then push min labels along edges until no update. */
  def connectedComponentsMutable(
      edges: Dataset[(Long, Long)], spark: SparkSession): Dataset[(Long, Long)] = {
    import spark.implicits._
    val und = DataBag.from(edges.union(edges.map(e => (e._2, e._1))).distinct().cache())
    val vertices = und.map(_._1).distinct
    val state = MutableBag(vertices.map(v => (v, v)))
    var delta = state.bag()
    var n = delta.size
    while (n > 0) {
      // messages: for each updated vertex, propose its label to neighbors
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
      n = delta.size
    }
    state.bag().ds
  }
}
