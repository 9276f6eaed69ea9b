package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Randomized differentials: each round-4 operator against a brute-force
  * Scala oracle on seeded random inputs. These catch the class of bug the
  * hand-computed goldens can't — edge shapes the author didn't think of. */
class DifferentialSpec extends AnyFlatSpec with Matchers {

  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812L)

  private def randDoc(maxTokens: Int): String = {
    val n = rnd.nextInt(maxTokens + 1)
    Seq.fill(n)(s"w${rnd.nextInt(6)}").mkString(" ")
  }

  "ngramJaccard (banded)" should "match the brute-force pair computation" in {
    val docs = (1L to 40L).map(i => (i, randDoc(12)))
    val got = Dedup.ngramJaccard(docs.toDF("doc_id", "text"), maxIdGap = 7)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap

    def sh(t: String): Set[String] = {
      val toks = t.trim.split("\\s+").toSeq
      if (toks.size < 3) Set.empty
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val withSh = docs.map { case (id, t) => (id, sh(t)) }.filter(_._2.nonEmpty)
    val expect = (for {
      (i1, s1) <- withSh; (i2, s2) <- withSh
      if i2 > i1 && i2 - i1 <= 7
      inter = (s1 & s2).size if inter > 0
    } yield {
      val j = inter.toDouble / (s1.size + s2.size - inter).toDouble
      (i1, i2) -> math.floor(j * 1e6 + 0.5) / 1e6
    }).toMap
    got.keySet shouldBe expect.keySet
    got.foreach { case (k, v) => v shouldBe expect(k) +- 1e-9 }
  }

  "repetitionSignals" should "match the brute-force n-gram stats" in {
    val docs = (1L to 60L).map(i => (i, randDoc(10)))
    val got = TextAnalysis.repetitionSignals(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap

    def grams(t: String, n: Int): Seq[String] = {
      val toks = t.trim.split("\\s+").toSeq
      if (toks.size < n) Seq.empty else toks.sliding(n).map(_.mkString(" ")).toSeq
    }
    def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
    docs.foreach { case (id, t) =>
      val g2 = grams(t, 2); val g3 = grams(t, 3)
      val c2 = g2.groupBy(identity).map(_._2.size)
      val c3 = g3.groupBy(identity).map(_._2.size)
      val top2 = if (g2.isEmpty) 0.0 else r4(c2.max.toDouble / g2.size)
      val dup2 = if (g2.isEmpty) 0.0 else r4(c2.filter(_ > 1).sum.toDouble / g2.size)
      val dup3 = if (g3.isEmpty) 0.0 else r4(c3.filter(_ > 1).sum.toDouble / g3.size)
      withClue(s"doc $id '$t': ") { got(id) shouldBe ((top2, dup2, dup3)) }
    }
  }

  "pageRankScaled" should "match a driver-side integer reference on a random graph" in {
    val edges = (1 to 120).map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
    val got = graft.lib.Graphs.pageRankScaled(edges.toDF("src", "dst"), iterations = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val S = 1000000000L
    val e = edges.filter(x => x._1 != x._2).distinct
    val verts = e.flatMap(x => Seq(x._1, x._2)).distinct
    val odeg = e.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var rank = verts.map(_ -> S).toMap
    for (_ <- 1 to 6) {
      val in = e.groupBy(_._2).map { case (v, es) =>
        v -> es.map(x => rank(x._1) / odeg(x._1)).sum
      }
      rank = verts.map(v => v -> (15L * S / 100L + 85L * in.getOrElse(v, 0L) / 100L)).toMap
    }
    got shouldBe rank
  }

  "zorderValue" should "match a driver-side bit interleave" in {
    val pts = (1 to 200).map(_ => (rnd.nextInt(1 << 10).toLong, rnd.nextInt(1 << 10).toLong))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zorderValue(Seq(col("x"), col("y")), 10).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      val z = (0 until 10).map(b =>
        (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))).reduce(_ | _)
      got((x, y)) shouldBe z
    }
  }

  "quantizeInt8" should "match a driver-side absmax quantizer" in {
    val vecs = (1L to 60L).map(i =>
      (i, Array.fill(rnd.nextInt(8) + 1)((rnd.nextFloat() - 0.5f) * 4f)))
    val got = Similarity.quantizeInt8(vecs.toDF("vec_id", "embedding"))
      .select("vec_id", "qvec").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    vecs.foreach { case (id, v) =>
      val absmax = v.map(x => math.abs(x.toDouble)).max
      val exp =
        if (absmax == 0.0) v.map(_ => 0).toSeq
        else v.map(x => math.floor(x.toDouble * 127.0 / absmax + 0.5).toInt).toSeq
      got(id) shouldBe exp
    }
  }

  "Stats.describeExact" should "match driver-side exact moments" in {
    val xs = (1 to 500).map(_ => rnd.nextInt(100).toDouble)
    val row = graft.lib.Stats.describeExact(xs.map(Tuple1(_)).toDF("x"), "x").head()
    val n = xs.size
    val mean = xs.sum / n
    val variance = (xs.map(x => x * x).sum - mean * mean * n) / (n - 1)
    row.getAs[Long]("n") shouldBe n.toLong
    row.getAs[Double]("mean") shouldBe mean +- 1e-9
    row.getAs[Double]("variance") shouldBe variance +- 1e-6
    row.getAs[Double]("stddev") shouldBe math.sqrt(variance) +- 1e-9
    row.getAs[Double]("mn") shouldBe xs.min
    row.getAs[Double]("mx") shouldBe xs.max
  }

  "Stats.describeVector" should "match driver-side per-dimension sums exactly" in {
    val vecs = (1 to 200).map(i => (i.toLong,
      Array.fill(8)(rnd.nextFloat() * 2f - 1f)))
    val got = graft.lib.Stats.describeVector(vecs.toDF("vec_id", "embedding"))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    for (dim <- 0 until 8) {
      val micros = vecs.map(v => math.floor(v._2(dim).toDouble * 1e6 + 0.5).toLong)
      got(dim) shouldBe ((micros.size.toLong, micros.sum,
        micros.map(m => m * m).sum, micros.min, micros.max))
    }
  }

  "directorsMuses" should "match a brute-force group/max computation" in {
    val credits = (1 to 300).map { _ =>
      val dir = rnd.nextInt(8).toLong
      val mov = rnd.nextInt(30).toLong
      if (rnd.nextBoolean()) (dir, mov, "director") else (dir + 100L, mov, "actor")
    }
    val got = graft.lib.Collaborations.directorsMuses(
        credits.toDF("personID", "movieID", "creditType"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ds = credits.filter(_._3 == "director")
    val as = credits.filter(_._3 == "actor")
    val counts = (for {
      (d, md, _) <- ds; (a, ma, _) <- as; if md == ma
    } yield (d, a)).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val exp = counts.filter { case ((d, _), c) =>
      val mx = counts.collect { case ((`d`, _), cc) => cc }.max
      c > 1 && c >= mx - 1
    }
    got shouldBe exp
  }

  "packByTokens" should "match a driver-side boundary-cut reference" in {
    val docs = (1L to 150L).map(i => (i, rnd.nextInt(300).toLong + 1L))
    val got = Packing.packByTokens(docs.toDF("doc_id", "nt"), col("doc_id"), col("nt"),
        targetTokens = 512L, numBuckets = 4)
      .select("doc_id", "bucket", "pack").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    docs.groupBy(_._1 % 4).foreach { case (b, ds) =>
      var cum = 0L
      ds.sortBy(_._1).foreach { case (id, nt) =>
        got(id) shouldBe ((b, cum / 512L))
        cum += nt
      }
    }
  }

  "ML.linregByGroup" should "recover exact lines and match brute OLS on random integer data" in {
    // group a: exact line y = 3x + 7; group b: random ints; group c: constant x
    val pts = (1 to 50).map(i => ("a", i.toLong, 3L * i + 7)) ++
      (1 to 80).map(_ => ("b", rnd.nextInt(40).toLong, rnd.nextInt(500).toLong)) ++
      (1 to 10).map(i => ("c", 5L, i.toLong))
    val got = graft.lib.ML.linregByGroup(pts.toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(r => r.getString(0) ->
        ((if (r.isNullAt(2)) null else r.getDouble(2),
          if (r.isNullAt(3)) null else r.getDouble(3)))).toMap
    got("a") shouldBe ((3.0, 7.0))
    got("c") shouldBe ((null, null)) // constant x -> undefined slope
    val bs = pts.filter(_._1 == "b")
    val n = bs.size.toDouble
    val (sx, sy) = (bs.map(_._2).sum.toDouble, bs.map(_._3).sum.toDouble)
    val sxy = bs.map(p => p._2 * p._3).sum.toDouble
    val sxx = bs.map(p => p._2 * p._2).sum.toDouble
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    got("b")._1.asInstanceOf[Double] shouldBe
      (math.floor(slope * 1e6 + 0.5) / 1e6) +- 1e-9
    got("b")._2.asInstanceOf[Double] shouldBe
      (math.floor((sy - slope * sx) / n * 1e6 + 0.5) / 1e6) +- 1e-9
  }

  "Curation.percentileCut" should "match a brute-force discrete percentile on random groups" in {
    val rows = (1 to 500).map(_ => (s"g${rnd.nextInt(6)}", rnd.nextInt(40).toLong))
    val got = Curation.percentileCut(rows.toDF("g", "v"), "g", "v", 0.9)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    val expect = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      val vs = rs.map(_._2).sorted
      val n = vs.size.toDouble
      // discrete cut: smallest v whose cume_dist (share of rows <= v) >= frac
      val cut = vs.find(v => vs.count(_ <= v) / n >= 0.9).get
      rs.filter(_._2 <= cut).map(r => (g, r._2))
    }.sorted
    got shouldBe expect
  }

  "Upsert.upsert" should "match a brute-force map merge on random keyed tables" in {
    val target = (1 to 120).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(100), rnd.nextInt(100).toDouble))
      .distinctBy(_._1)
    val source = (1 to 60).map(_ => (rnd.nextInt(90).toLong, rnd.nextInt(100), rnd.nextInt(100).toDouble))
      .distinctBy(_._1)
    val got = Upsert.upsert(target.toDF("k", "a", "b"), source.toDF("k", "a", "b"), Seq("k"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    val expect = target.map(t => t._1 -> ((t._2, t._3))).toMap ++
      source.map(s => s._1 -> ((s._2, s._3))).toMap
    got shouldBe expect
  }

  "Upsert.scd2" should "match a brute-force run collapse on random event streams" in {
    val ev = (1 to 400).map(i =>
      (rnd.nextInt(8).toLong, s"s${rnd.nextInt(3)}", rnd.nextInt(50).toLong, i.toLong))
    // runs can TIE on valid_from (t-ties split by id across attr changes),
    // so compare per-key MULTISETS under one shared sort key, not run order
    val got = Upsert.scd2(ev.toDF("k", "attr", "t", "id"), "k", "attr", Seq("t", "id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
      .groupBy(_._1).view
      .mapValues(_.map(x => (x._2, x._3, x._4)).sorted.toList).toMap
    val expect = ev.groupBy(_._1).view.mapValues { es =>
      val ordered = es.sortBy(e => (e._3, e._4))
      val runs = scala.collection.mutable.ListBuffer.empty[(String, Long)]
      for (e <- ordered)
        if (runs.isEmpty || runs.last._1 != e._2) runs += ((e._2, e._3))
      runs.toList.zipWithIndex.map { case ((attr, from), i) =>
        val to = if (i + 1 < runs.size) runs(i + 1)._2 else -1L
        (attr, from, to)
      }.sorted
    }.toMap
    got.keySet shouldBe expect.keySet
    for (k <- expect.keySet) got(k) shouldBe expect(k)
  }

  "Graphs.bfsHops" should "match brute-force BFS on random digraphs" in {
    val edges = (1 to 300).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2).distinct
    val sources = Seq(0L, 7L)
    val got = graft.lib.Graphs.bfsHops(edges.toDF("src", "dst"),
        sources.toDF("vertex"), maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // brute BFS
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var dist = sources.map(_ -> 0).toMap
    var frontier = sources.toSet
    for (h <- 1 to 4) {
      val next = frontier.flatMap(v => adj.getOrElse(v, Nil))
        .filterNot(dist.contains)
      dist = dist ++ next.map(_ -> h)
      frontier = next
    }
    got shouldBe dist
  }

  "Graphs.shortestPathsBounded" should "match hop-bounded DP on random weighted digraphs" in {
    val edges = (1 to 250).map(_ =>
      (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong, (1 + rnd.nextInt(9)).toLong))
      .filter(e => e._1 != e._2)
    val sources = Seq(0L, 5L)
    val got = graft.lib.Graphs.shortestPathsBounded(edges.toDF("src", "dst", "w"),
        sources.toDF("vertex"), maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // DP: d[h][v] = min weight over paths of <= h edges
    var d = sources.map(_ -> 0L).toMap
    for (_ <- 1 to 3) {
      val relaxed = edges.flatMap { case (s, t, w) => d.get(s).map(ds => t -> (ds + w)) }
      d = (d.toSeq ++ relaxed).groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    }
    got shouldBe d
  }

  "Sweep.concurrency" should "match a brute-force open-interval count on random intervals" in {
    val ivs = (1 to 200).map { _ =>
      val s = rnd.nextInt(1000).toLong
      (s, s + 1 + rnd.nextInt(150))
    }
    val got = Sweep.concurrency(ivs.toDF("s", "e"), "s", "e", bucketUs = 64L)
      .where(col("delta") === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2))
    // brute force: at each start t, count intervals with s <= t < e; tied
    // starts share the count of ALL intervals starting at t (the sweep
    // assigns prefix ranks within the tie, so compare per-t multisets of
    // the FINAL rank = brute count down to brute count - ties + 1)
    ivs.map(_._1).distinct.foreach { t =>
      val open = ivs.count { case (s, e) => s <= t && t < e }
      val ties = ivs.count(_._1 == t)
      val concs = got.filter(_._1 == t).map(_._2).sorted
      concs shouldBe ((open - ties + 1).toLong to open.toLong).toVector
    }
  }

  "Resample.resampleFfill" should "match a brute-force grid fill on random series" in {
    val ev = (1 to 300).map { i =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(400).toLong, rnd.nextInt(50).toDouble, i.toLong)
    }
    val got = Resample.resampleFfill(ev.toDF("k", "t", "v", "id"),
        "k", "t", "v", "id", stepUs = 25L)
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getDouble(2))).toMap
    ev.groupBy(_._1).foreach { case (k, es) =>
      val ticks = es.map(_._2 / 25L)
      for (tick <- ticks.min to ticks.max) {
        // latest event at-or-before this tick's end, by (t, id)
        val best = es.filter(_._2 / 25L <= tick).maxBy(e => (e._2, e._4))
        withClue(s"key $k tick $tick: ") { got((k, tick)) shouldBe best._3 }
      }
    }
    got.size shouldBe ev.groupBy(_._1).map { case (_, es) =>
      val ticks = es.map(_._2 / 25L); ticks.max - ticks.min + 1
    }.sum
  }
}
