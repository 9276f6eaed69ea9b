package graft

import org.apache.spark.sql.functions._

/** Scale probe for the round-8c ops (test-scope main): replicate the
  * corpus N× and compare 1× vs N× wall time for the unigram tokenizer
  * (expect SUBLINEAR — EM cost tracks the word histogram, which saturates
  * under replication), first-fit packing, PQ encode + ADC probe (fixed
  * query set), and quality-model corpus scoring (expect ~linear narrow
  * passes). Usage: sbt "Test/runMain graft.ProfileRound8c [sfDir] [N]" */
object ProfileRound8c {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val n = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .appName("profile-round8c").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs1 = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "source").localCheckpoint()
    val maxId = docs1.agg(max("doc_id")).head().getLong(0) + 1
    val docsN = (0 until n).map(i => docs1.select(
        (col("doc_id") + lit(i * maxId)).as("doc_id"), col("text"), col("source")))
      .reduce(_ unionByName _).repartition(32).localCheckpoint()

    val emb1 = spark.read.parquet(s"$sf/embeddings.parquet").localCheckpoint()
    val maxVid = emb1.agg(max("vec_id")).head().getLong(0) + 1
    val embN = (0 until n).map(i => emb1.select(
        (col("vec_id") + lit(i * maxVid)).as("vec_id"), col("embedding"), col("label")))
      .reduce(_ unionByName _).repartition(32).localCheckpoint()

    def time(label: String)(f: => Long): Double = {
      val t0 = System.nanoTime(); val rows = f
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"$label%-26s $secs%7.2f s   rows=$rows")
      secs
    }
    println(s"== ${docs1.count()} docs / ${emb1.count()} vecs at 1x; ${n}x replicas ==")

    val ntok = size(split(trim(col("text")), "\\s+")).cast("long")

    val u1 = time("unigram train 1x") {
      graft.ops.Unigram.train(docs1, vocabSize = 200, seedSize = 1500).pieces.size.toLong }
    val uN = time(s"unigram train ${n}x") {
      graft.ops.Unigram.train(docsN, vocabSize = 200, seedSize = 1500).pieces.size.toLong }

    val f1 = time("ffd pack 1x") {
      graft.ops.Packing.packFirstFit(docs1, col("doc_id"), ntok, 256L, 32).count() }
    val fN = time(s"ffd pack ${n}x") {
      graft.ops.Packing.packFirstFit(docsN, col("doc_id"), ntok, 256L, 32).count() }

    val cb = graft.ops.Pq.train(emb1, m = 8, ksub = 16, maxIter = 4)
    val p1 = time("pq encode 1x") { graft.ops.Pq.encode(cb, emb1).count() }
    val pN = time(s"pq encode ${n}x") { graft.ops.Pq.encode(cb, embN).count() }
    val qs = emb1.where(col("vec_id") < 8)
    val codes1 = graft.ops.Pq.encode(cb, emb1).localCheckpoint()
    val codesN = graft.ops.Pq.encode(cb, embN).localCheckpoint()
    val a1 = time("adc probe 1x") { graft.ops.Pq.adcTopK(cb, codes1, qs, 10).count() }
    val aN = time(s"adc probe ${n}x") { graft.ops.Pq.adcTopK(cb, codesN, qs, 10).count() }

    val labels1 = docs1.select(col("doc_id").as("id"),
      (col("doc_id") % 3 =!= 0).cast("int").as("y"))
    val model = graft.ops.Quality.train(docs1, labels1, "doc_id", "text",
      lr = 16.0, iters = 30)
    val s1 = time("quality score 1x") {
      graft.ops.Quality.score(docs1, model, "doc_id", "text").count() }
    val sN = time(s"quality score ${n}x") {
      graft.ops.Quality.score(docsN, model, "doc_id", "text").count() }

    println(f"ratios at ${n}x: unigram=${uN / u1}%.1f ffd=${fN / f1}%.1f " +
      f"pq_encode=${pN / p1}%.1f adc=${aN / a1}%.1f quality=${sN / s1}%.1f " +
      s"(linear would be <= $n; unigram should be well under)")
    spark.stop()
  }
}
