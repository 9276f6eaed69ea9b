package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic (embedding-space) deduplication — the SemDeDup pipeline
  * (Abbas et al. 2023, arXiv:2303.09540): cluster the corpus embeddings
  * with kMeans, compare pairs only WITHIN a cluster, and keep one
  * representative per group of mutually-near vectors.
  *
  * Deterministic variant: near-dup groups are the connected components of
  * the within-cluster cosine graph (threshold `minCos`) and the kept
  * representative is the minimum id of each component — no random choice,
  * so results are reproducible across engines and partitionings.
  *
  * Scale design: the clustering step exists precisely to bound the
  * quadratic — pair comparison is an equi-join on the cluster id, so the
  * cost is sum over clusters of |cluster|², not |corpus|²; at production
  * scale `nClusters` grows with the corpus (SemDeDup uses ~10⁵ clusters for
  * billions of docs) keeping cluster occupancy roughly constant. The
  * component step runs only on the near-dup EDGE set (tiny relative to the
  * corpus), reusing the exchange-free label-propagation CC.
  */
object SemDedup {

  /** Per-vector dedup decision: `(id, cluster, rep, keep)` where `rep` is
    * the minimum id of the vector's near-dup component (its own id if it has
    * no near neighbor) and `keep = (rep == id)`. */
  def semDedup(emb: DataFrame, minCos: Double = 0.95, nClusters: Int = 8,
      maxIter: Int = 6, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    val assigned = graft.lib.KMeans.fit(emb, nClusters, maxIter, idCol, vecCol)
    // one narrow relation feeding both join sides and the final projection;
    // localCheckpoint materializes it once and severs the self-join lineage
    val v = Par.spread(emb)
      .select(col(idCol).as("id"), col(vecCol).cast("array<float>").as("v"))
      .join(assigned.select(col(idCol).as("id"), col("cluster")), "id")
      .localCheckpoint()
    // The isnan guard matters: a zero-norm vector (failed embed, padding)
    // yields cosine = 0/0 = NaN, and Spark's nan-safe ordering treats NaN as
    // GREATER than any double — without the guard one zero vector would
    // "near-dup" its whole cluster into a single group.
    val sim = Similarity.cosine(col("a.v"), col("b.v"))
    val pairs = v.as("a").join(v.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.id") < col("b.id"))
      .where(!isnan(sim) && sim >= lit(minCos))
      .select(col("a.id").as("src"), col("b.id").as("dst"))
    val comp = graft.lib.Graphs.connectedComponents(pairs, spark)
    v.select(col("id"), col("cluster"))
      .join(comp.select(col("vertex").as("id"), col("label").as("__rep")), Seq("id"), "left")
      .select(col("id"), col("cluster"),
        coalesce(col("__rep"), col("id")).as("rep"),
        (coalesce(col("__rep"), col("id")) === col("id")).as("keep"))
  }
}
