package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF-PQ vector index — the production composition of
  * [[AnnIndex]] (coarse cells → planning-time partition pruning) and
  * [[Pq]] (codes → a 32×-smaller scan): the classic large-scale ANN layout.
  *
  * On disk: coarse centroids + PQ codebooks as droplet-sized relations, and
  * the CODE table (did, code, est_norm) Hive-partitioned by coarse cell.
  * A probe therefore reads `nprobe/nlist` of a table that is already m
  * bytes per vector — at 100 TB of raw embeddings, a probe of an 8-byte
  * 64-cell index touches ~1/32 × nprobe/64 of the original bytes, with the
  * pruning visible in the plan (`PartitionFilters`, spec-asserted).
  * Scoring is [[Pq.adcTopK]]'s ADC with optional exact rerank against the
  * raw corpus (which stays wherever it lives — the index never duplicates
  * vectors).
  *
  * Both quantizers are deterministic (lowest-id Lloyd init), so
  * build → save → load → probe reproduces the in-memory probe exactly.
  */
object PqIndex {

  /** An IVF-PQ index: coarse centroids, PQ codebooks, and the cell-tagged
    * code relation `(did, code, est_norm, cell)`. */
  case class IvfPq(coarse: Array[(Int, Seq[Double])], cb: Pq.Codebooks,
      codes: DataFrame)

  /** ONE narrow pass producing `(did, code, est_norm, cell)` — PQ codes
    * and the coarse-cell assignment are per-row projections of the same
    * input row, so materializing them together avoids a second corpus
    * scan and a corpus-wide join on did. */
  private[graft] def encodeWithCell(cb: Pq.Codebooks,
      coarse: Array[(Int, Seq[Double])], vecs: DataFrame,
      idCol: String, vecCol: String): DataFrame =
    Par.spread(vecs)
      .select(col(idCol).as("did"), col(vecCol).as("__v"),
        Pq.codeExpr(cb, col(vecCol)).as("code"))
      .withColumn("est_norm", Pq.estNormExpr(cb))
      .withColumn("cell",
        graft.lib.KMeans.nearestCentroids(coarse, col("__v"), 1)(0))
      .drop("__v")

  /** Train coarse + product quantizers and encode the corpus. `trainCap`
    * (0 = auto) caps BOTH quantizers' training sets via a deterministic
    * id-hash sample; encoding always covers the full corpus. */
  def build(corpus: DataFrame, nlist: Int = 8, m: Int = 8, ksub: Int = 16,
      maxIter: Int = 10, idCol: String = "vec_id",
      vecCol: String = "embedding", trainCap: Long = 0): IvfPq = {
    val coarse = graft.lib.KMeans.centroids(corpus, nlist, maxIter, idCol, vecCol,
      trainCap = trainCap)
    val cb = Pq.train(corpus, m, ksub, maxIter, idCol, vecCol,
      trainCap = trainCap)
    IvfPq(coarse, cb, encodeWithCell(cb, coarse, corpus, idCol, vecCol))
  }

  /** Persist: quantizers as flat relations, codes PARTITIONED BY CELL. */
  def save(idx: IvfPq, dir: String): Unit = {
    val spark = idx.codes.sparkSession
    import spark.implicits._
    idx.coarse.toSeq
      .flatMap { case (cid, v) => v.zipWithIndex.map { case (x, i) => (cid, i, x) } }
      .toDF("cid", "dim", "x")
      .write.mode("overwrite").parquet(s"$dir/coarse")
    Pq.saveCodebooks(spark, idx.cb, s"$dir/books")
    // clustered by cell (same rationale as AnnIndex.save): one file per
    // cell per write task, not the tasks × cells fan-out
    idx.codes.repartition(col("cell")).write.mode("overwrite")
      .partitionBy("cell").parquet(s"$dir/codes")
  }

  /** Extend a SAVED index in place: encode the batch with the saved
    * (immutable) quantizers and APPEND the code rows — only the touched
    * cell partitions gain files, nothing is re-read or rewritten (the
    * [[AnnIndex.appendSaved]] ingest shape on the compressed relation). */
  def appendSaved(spark: SparkSession, dir: String, newVecs: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val idx = load(spark, dir)
    encodeWithCell(idx.cb, idx.coarse, newVecs, idCol, vecCol)
      .repartition(col("cell")) // one appended file per touched cell/task
      .write.mode("append").partitionBy("cell").parquet(s"$dir/codes")
  }

  /** Tombstone vectors in a SAVED index: ids append to a `deleted`
    * relation that [[load]] anti-joins away (broadcast) — no code file is
    * rewritten; probes exclude the ids immediately. */
  def deleteSaved(spark: SparkSession, dir: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    ids.toDF("did").write.mode("append").parquet(s"$dir/deleted")
  }

  /** Reload a saved index. */
  def load(spark: SparkSession, dir: String): IvfPq = {
    val coarse = spark.read.parquet(s"$dir/coarse")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._1).toArray.sortBy(_._1)
      .map { case (cid, rows) => (cid, rows.sortBy(_._2).map(_._3).toSeq) }
    val cb = Pq.loadCodebooks(spark, s"$dir/books")
    val codes0 = spark.read.parquet(s"$dir/codes")
      .select(col("did"), col("code"), col("est_norm"),
        col("cell").cast("int").as("cell"))
    val delPath = new org.apache.hadoop.fs.Path(s"$dir/deleted")
    val fs = delPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val codes = if (fs.exists(delPath))
      codes0.join(broadcast(spark.read.parquet(s"$dir/deleted")),
        Seq("did"), "left_anti")
    else codes0
    IvfPq(coarse, cb, codes)
  }

  /** ADC top-k over the probed cells only: each query's `nprobe` nearest
    * coarse cells resolve up front (the probe-cell union is ≤
    * nprobe×|queries| ints), so a LOADED index scans only the matching
    * cell partitions — planning-time `PartitionFilters`, the q171
    * property, on a code table 32× smaller than the vectors. */
  def probe(idx: IvfPq, queries: DataFrame, k: Int = 10, nprobe: Int = 2,
      rerankWith: Option[DataFrame] = None, rerankFactor: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // the probe cells ride WITH each query row (per-query candidate sets,
    // the IVF semantic), duplicating only the droplet-sized query side
    val q = Pq.querySide(idx.cb, queries, idCol, vecCol)
      .join(queries.select(col(idCol).as("qid"),
        explode(graft.lib.KMeans.nearestCentroids(idx.coarse, col(vecCol),
          nprobe)).as("cell")), "qid")
    val cells = q.select("cell").distinct().collect().map(_.getInt(0))
    val cand = idx.codes.where(col("cell").isin(cells.map(Integer.valueOf): _*))
    // hint at the JOIN site only — hinting `q` itself would leave a dead
    // broadcast hint in the cell-resolution plan above (no join there)
    val scored = broadcast(q).join(cand, Seq("cell"))
      .where(col("qid") =!= col("did"))
      .select(col("qid"), col("qv"), col("did"), Pq.adcSim.as("sim"))
      .where(!isnan(col("sim")))
    Pq.rankAndRerank(scored, k, rerankWith, rerankFactor, idCol, vecCol)
  }
}
