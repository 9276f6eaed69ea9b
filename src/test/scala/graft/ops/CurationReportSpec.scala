package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Filter-cascade attribution and the deterministic training-order
  * shuffle, against hand-computed goldens and sequential references. */
class CurationReportSpec extends AnyFlatSpec with Matchers {

  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  behavior of "Filters.filterReport"

  private val docs = Seq(
    (1L, 60, "en"),  // fails min_len
    (2L, 60, "zz"),  // fails min_len FIRST (cascade: not attributed to lang)
    (3L, 200, "zz"), // fails lang
    (4L, 200, "en"), // kept
    (5L, 200, "en")  // kept
  ).toDF("id", "len", "lang")

  private val cascade = Seq(
    "min_len" -> (col("len") >= 100),
    "bad_lang" -> (col("lang") === "en"),
    "never_fires" -> lit(true))

  it should "attribute each row to the FIRST failing filter only" in {
    val got = Filters.filterReport(docs, cascade)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got shouldBe Map(
      "min_len" -> 2L, "bad_lang" -> 1L, "never_fires" -> 0L, "kept" -> 2L)
  }

  it should "count a null predicate result as a removal" in {
    val d = Seq((1L, Some(5)), (2L, None), (3L, Some(50))).toDF("id", "q")
    val got = Filters.filterReport(d, Seq("low_q" -> (col("q") >= 10)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got shouldBe Map("low_q" -> 2L, "kept" -> 1L)
  }

  it should "agree with applyCascade on the survivor set" in {
    val kept = Filters.applyCascade(docs, cascade)
    kept.select("id").as[Long].collect().sorted shouldBe Array(4L, 5L)
    val reported = Filters.filterReport(docs, cascade)
      .where(col("filter") === Filters.KeptLabel)
      .head().getLong(1)
    reported shouldBe kept.count()
  }

  behavior of "Shuffling.deterministicShuffle"

  private def shuffled(parts: Int) = Shuffling.deterministicShuffle(
    spark.range(0, 500).repartition(parts).toDF("id"),
    col("id"), nShards = 8, seed = 7L)

  it should "be a pure function of (seed, key) — invariant to partitioning" in {
    val a = shuffled(1).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val b = shuffled(13).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    a shouldBe b
  }

  it should "assign dense 0-based positions within every shard" in {
    val bad = shuffled(4).groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"),
        countDistinct("pos").as("nd"))
      .where(col("mn") =!= 0 || col("mx") =!= col("n") - 1 || col("nd") =!= col("n"))
    bad.count() shouldBe 0L
  }

  it should "match a sequential reference implementation exactly" in {
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val exp = (0L until 500L).map { id =>
      val h = md5hex(s"7-$id")
      (id, h, (Integer.parseInt(h.substring(0, 4), 16) % 8).toLong)
    }.groupBy(_._3).flatMap { case (shard, rows) =>
      rows.sortBy(r => (r._2, r._1.toString)).zipWithIndex
        .map { case ((id, _, _), i) => (id, shard, i.toLong) }
    }.toSeq.sorted
    val got = shuffled(3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    got shouldBe exp
  }

  it should "produce a different order under a different seed" in {
    val a = Shuffling.deterministicShuffle(
      spark.range(0, 500).toDF("id"), col("id"), 8, seed = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val b = Shuffling.deterministicShuffle(
      spark.range(0, 500).toDF("id"), col("id"), 8, seed = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    a should not be b
  }

  "Shuffling.curriculumShuffle" should "order stages in sequence with a shuffle inside each" in {
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val df = spark.range(0, 400)
      .select(col("id"), (col("id") % 3).as("tier"))
    val got = Shuffling.curriculumShuffle(df, col("id"), col("tier"), 4, 9L)
      .select("id", "tier", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // sequential twin: per shard, sort by (stage, md5, id-string)
    val exp = (0L until 400L).map { id =>
      val h = md5hex(s"9-$id")
      (id, id % 3, (Integer.parseInt(h.substring(0, 4), 16) % 4).toLong, h)
    }.groupBy(_._3).flatMap { case (shard, rows) =>
      rows.sortBy(r => (r._2, r._4, r._1.toString)).zipWithIndex
        .map { case ((id, tier, _, _), i) => (id, tier, shard, i.toLong) }
    }.toSeq.sorted
    got.sorted.toSeq shouldBe exp
    // stages are non-decreasing along every shard's position order
    got.groupBy(_._3).foreach { case (_, rows) =>
      val tiers = rows.sortBy(_._4).map(_._2)
      tiers shouldBe tiers.sorted
    }
  }

  "Shuffling.writeShards" should "export shard files whose name order IS the training order" in {
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
    try {
      Shuffling.writeShards(spark.range(0, 500).toDF("id"), col("id"),
        nShards = 4, seed = 7L, s"$dir/shards")
      // read-back reproduces the in-memory assignment exactly
      val back = Shuffling.readShards(spark, s"$dir/shards")
        .select(col("id"), col("shard").cast("long"), col("pos"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      val direct = Shuffling.deterministicShuffle(
          spark.range(0, 500).toDF("id"), col("id"), 4, 7L)
        .select("id", "shard", "pos")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      back shouldBe direct
      // per shard: each file is pos-sorted and files in NAME order carry
      // non-overlapping ascending ranges — a sequential reader streams the
      // training order without sorting
      val shardDirs = new java.io.File(s"$dir/shards").listFiles
        .filter(_.getName.startsWith("shard="))
      shardDirs.length shouldBe 4
      for (sd <- shardDirs) {
        val files = sd.listFiles.filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
        val ranges = files.flatMap { f =>
          val rows = spark.read.parquet(f.getAbsolutePath)
            .select("pos").collect().map(_.getLong(0))
          rows shouldBe rows.sorted
          if (rows.nonEmpty) Some((rows.min, rows.max)) else None
        }
        ranges.sliding(2).foreach {
          case Array((_, amax), (bmin, _)) => amax should be < bmin
          case _ => ()
        }
      }
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  it should "manifest every shard with exact counts and a tamper-sensitive checksum" in {
    val dir = java.nio.file.Files.createTempDirectory("graft_shards_manifest").toString
    try {
      Shuffling.writeShards(spark.range(0, 500).toDF("id"), col("id"),
        nShards = 4, seed = 7L, s"$dir/shards")
      val m = Shuffling.shardManifest(spark, s"$dir/shards", "id").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4)))
      m.length shouldBe 4
      m.map(_._2).sum shouldBe 500L
      all(m.map(_._4)) shouldBe true          // dense 0..n-1 positions
      m.foreach { case (_, n, maxPos, _, _) => maxPos shouldBe n - 1 }
      m.map(_._5).distinct.length shouldBe 4  // checksums differ per shard
      // checksum is content-addressed: dropping one row changes it
      val tampered = Shuffling.readShards(spark, s"$dir/shards")
        .where(col("shard") === m.head._1)
      val fullSum = m.find(_._1 == m.head._1).get._5
      val minusOne = tampered.where(col("pos") =!= 0L)
        .agg(sum(conv(substring(md5(col("id").cast("string")), 1, 8), 16, 10)
          .cast("long"))).head().getLong(0)
      minusOne should not be fullSum
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  it should "resume a shard from a position with pruning, not a scan" in {
    val dir = java.nio.file.Files.createTempDirectory("graft_shards_resume").toString
    try {
      Shuffling.writeShards(spark.range(0, 2000).toDF("id"), col("id"),
        nShards = 4, seed = 7L, s"$dir/shards")
      val resumed = Shuffling.readShardFrom(spark, s"$dir/shards", shard = 2L, fromPos = 100L)
      val plan = resumed.queryExecution.executedPlan.toString
      // shard dirs prune at planning time; pos reaches the parquet scan
      plan should include("PartitionFilters")
      plan should include regex "PartitionFilters: \\[[^\\]]*shard"
      plan should include regex "PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(pos"
      val full = Shuffling.deterministicShuffle(
          spark.range(0, 2000).toDF("id"), col("id"), 4, 7L)
        .where(col("shard") === 2L && col("pos") >= 100L)
        .select("id", "pos").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      resumed.select("id", "pos").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted shouldBe full
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  behavior of "Shuffling.weightedInterleave"

  private def mkSources(sizes: Seq[Int], weights: Seq[Int]) = {
    var base = 0L
    sizes.zip(weights).zipWithIndex.map { case ((n, w), i) =>
      val df = spark.range(base, base + n).toDF("id")
      base += n
      (s"s$i", df, w)
    }
  }

  it should "equal the global-sort merge rank on random sizes and weights" in {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 5) {
      val k = 2 + rnd.nextInt(3)
      val sizes = Seq.fill(k)(rnd.nextInt(120) + 1)
      val weights = Seq.fill(k)(rnd.nextInt(5) + 1)
      val srcs = mkSources(sizes, weights)
      val got = Shuffling.weightedInterleave(srcs, "id", seed = 3L)
        .select("source", "id", "gpos").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      // reference: materialize virtual times and globally sort on the
      // driver — the formulation the closed form must reproduce
      val big = weights.map(_.toLong).reduce { (a, b) =>
        @annotation.tailrec def g(x: Long, y: Long): Long = if (y == 0) x else g(y, x % y)
        a / g(a, b) * b
      }
      def md5hex(x: String) = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val exp = srcs.zipWithIndex.flatMap { case ((name, df, w), i) =>
        val ids = df.collect().map(_.getLong(0)).toSeq
        ids.map(id => (id, md5hex(s"3-$id"))).sortBy(t => (t._2, t._1.toString))
          .zipWithIndex.map { case ((id, _), p) =>
            (name, id, (p + 1L) * (big / w), i)
          }
      }.sortBy(t => (t._3, t._4)).zipWithIndex
        .map { case ((name, id, _, _), g) => (name, id, g.toLong) }
      got.sorted shouldBe exp.sorted
    }
  }

  it should "keep every prefix within one stride of the target ratios" in {
    val srcs = mkSources(Seq(300, 300, 300), Seq(3, 2, 1))
    val order = Shuffling.weightedInterleave(srcs, "id", seed = 5L)
      .select("source", "gpos").collect()
      .map(r => (r.getLong(1), r.getString(0))).sortBy(_._1).map(_._2)
    // W = 6; in any prefix of length p, source s0 (stride 2) must have
    // emitted within 1 of p*w/W until it exhausts
    for (p <- Seq(60, 120, 300, 480)) {
      val c0 = order.take(p).count(_ == "s0")
      math.abs(c0 - p * 3.0 / 6).toInt should be <= 1
    }
  }

  behavior of "Sampling.hashSplit"

  it should "partition every row into exactly one split, deterministically" in {
    val df = spark.range(0, 2000).toDF("id")
    val a = Sampling.hashSplit(df, col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    a.count() shouldBe 2000L
    a.groupBy("id").agg(countDistinct("split").as("k"))
      .where(col("k") =!= 1).count() shouldBe 0L
    val counts = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.values.sum shouldBe 2000L
    // hash thresholds put roughly the right mass in each split
    counts("train").toDouble should (be > 1500.0 and be < 1700.0)
    val b = Sampling.hashSplit(df.repartition(7), col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    a.collect().map(r => (r.getLong(0), r.getString(1))).sorted shouldBe b
  }

  it should "use the q180 oracle's exact hex thresholds" in {
    Sampling.thresholdHex(0.8) shouldBe "cccccccc"
    Sampling.thresholdHex(0.8 + 0.1) shouldBe "e6666666"
  }

  behavior of "Sampling.upsampleDeterministic"

  it should "repeat whole epochs and hash-threshold the partial epoch" in {
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val df = spark.range(0, 1000).toDF("id")
    val got = Sampling.upsampleDeterministic(df, col("id"), factor = 2.4, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val exp = (0L until 1000L).flatMap { id =>
      val base = Seq((id, 0L), (id, 1L))
      if (md5hex(s"7-$id").substring(0, 8) < "66666666") base :+ ((id, 2L)) else base
    }.sorted
    got.toSeq shouldBe exp
    got.length.toDouble should (be > 2200.0 and be < 2600.0)
    // integral factor: no partial rows; sub-1 factor: seeded Bernoulli
    Sampling.upsampleDeterministic(df, col("id"), 2.0, 7L).count() shouldBe 2000L
    val sub = Sampling.upsampleDeterministic(df, col("id"), 0.4, 7L)
    sub.agg(max("epoch")).head().getLong(0) shouldBe 0L
    sub.count().toDouble should (be > 300.0 and be < 500.0)
  }

  behavior of "Shuffling.orderedIndex"

  it should "equal ROW_NUMBER over the key order under any partitioning" in {
    val rnd = new scala.util.Random(23)
    val keys = rnd.shuffle((0L until 777L).map(_ * 3 + 1)).toSeq
    for (parts <- Seq(1, 7, 32)) {
      val df = keys.toDF("k").repartition(parts)
      val got = Shuffling.orderedIndex(df, "k").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      val exp = keys.sorted.zipWithIndex.map { case (k, i) => (k, i.toLong) }
      got shouldBe exp.sorted
    }
  }

  behavior of "Shuffling.negativeSample"

  it should "match a sequential reference and never emit a positive" in {
    def md5hex(x: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val items = (0L until 200L).map(i => (i, (i % 5).toInt))
    val anchors = items.filter(_._1 % 17 == 0)
    val itemsDf = items.toDF("item", "grp").select("item")
    val anchorsDf = anchors.toDF("anchor", "grp")
    // positives: same grp
    val positivesDf = anchors.toDF("anchor", "agrp")
      .join(items.toDF("item", "grp"), col("agrp") === col("grp"))
      .select("anchor", "item")
    val got = Shuffling.negativeSample(anchorsDf, "anchor", itemsDf, "item",
        positivesDf, k = 4, nDraws = 10, seed = 99L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    // sequential twin
    val sortedItems = items.map(_._1).sorted
    val grpOf = items.toMap
    val exp = anchors.flatMap { case (a, ag) =>
      val hits = (0 until 10).map { i =>
        val hv = java.lang.Long.parseLong(md5hex(s"99-$a-$i").substring(0, 8), 16)
        (i.toLong, sortedItems((hv % 200).toInt))
      }.filter { case (_, it) => grpOf(it) != ag }
      val ded = hits.groupBy(_._2).map { case (it, ds) => (ds.map(_._1).min, it) }
        .toSeq.sortBy(_._1).take(4)
      ded.zipWithIndex.map { case ((_, it), r) => (a, it, r + 1L) }
    }.sorted
    got shouldBe exp
    // and no emitted pair is a positive
    val pos = anchors.flatMap { case (a, ag) =>
      items.filter(_._2 == ag).map(it => (a, it._1)) }.toSet
    got.foreach { case (a, it, _) => pos should not contain ((a, it)) }
  }

  it should "probe a prebuilt (saved and loaded) index without re-ranking" in {
    val items = (0L until 300L).toDF("item")
    val dir = java.nio.file.Files.createTempDirectory("graft_negidx").toString
    try {
      Shuffling.saveItemIndex(Shuffling.itemIndex(items, "item"), s"$dir/idx")
      val loaded = Shuffling.loadItemIndex(spark, s"$dir/idx")
      val anchors = Seq(1L, 2L, 3L).toDF("anchor")
      val pos = Seq((1L, 5L), (2L, 7L)).toDF("anchor", "item")
      // constructing the probe must not launch the ranking jobs the inline
      // path runs eagerly (range-repartition checkpoint, offset collect,
      // THEN the modulus aggregate — ≥4 jobs under AQE): only the
      // max(__idx) aggregate may run before consumption (2 jobs under AQE:
      // shuffle stage + result stage)
      val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
      val probe = Shuffling.negativeSampleIndexed(anchors, "anchor", loaded,
        "item", pos, k = 2, nDraws = 6, seed = 11L)
      val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
      (after - before) should be <= 2
      val inline = Shuffling.negativeSample(anchors, "anchor", items, "item",
        pos, k = 2, nDraws = 6, seed = 11L)
      probe.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted shouldBe
        inline.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  behavior of "Streams.streamFilterReport"

  it should "equal the batch report no matter how ingest is micro-batched" in {
    val docs = spark.range(0, 400)
      .select(col("id"), (col("id") % 7 * 40).as("len"))
    val cascade = Seq("short" -> (col("len") >= 100))
    val dir = java.nio.file.Files.createTempDirectory("graft_rep_spec").toString
    try {
      docs.repartition(5).write.parquet(s"$dir/src")
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/src")
      val streamed = graft.streaming.Streams.streamFilterReport(stream, cascade)
      val batch = Filters.filterReport(docs, cascade)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      streamed shouldBe batch
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }
}
