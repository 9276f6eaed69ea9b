package graft.api

import org.apache.spark.sql.{Encoders, SparkSession}
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.api.alg._

/** Backend-parametric op spec in the spirit of the reference DataBagSpec:
  * every engine op is asserted equal to the straightforward Scala-collections
  * formulation (order-insensitive bag equality). */
class DataBagSpec extends AnyFlatSpec with Matchers {

  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private val xs = Seq(1, 2, 2, 3, 4, 5, 5, 5)
  private val ys = Seq(4, 5, 6, 7)
  private def bag(s: Seq[Int]): DataBag[Int] = DataBag(s)
  private def asBag[A](s: Seq[A]): Map[A, Int] =
    s.groupBy(identity).view.mapValues(_.size).toMap

  "empty/apply/collect" should "round-trip" in {
    DataBag.empty[Int].collect() shouldBe empty
    asBag(bag(xs).collect()) shouldBe asBag(xs)
  }

  "map" should "match Seq.map" in {
    asBag(bag(xs).map(_ * 10).collect()) shouldBe asBag(xs.map(_ * 10))
  }

  "flatMap" should "match Seq.flatMap" in {
    asBag(bag(xs).flatMap(x => Seq(x, -x)).collect()) shouldBe
      asBag(xs.flatMap(x => Seq(x, -x)))
  }

  "withFilter" should "support for-comprehensions" in {
    val r = for { x <- bag(xs) if x % 2 == 0 } yield x + 1
    asBag(r.collect()) shouldBe asBag(xs.filter(_ % 2 == 0).map(_ + 1))
  }

  "where/select Column fast path" should "agree with lambda path" in {
    val a = bag(xs).where(org.apache.spark.sql.functions.col("value") > 2)
    val b = bag(xs).filter(_ > 2)
    a.bagEquals(b) shouldBe true
  }

  "union" should "respect duplicates (UNION ALL)" in {
    asBag(bag(xs).union(bag(ys)).collect()) shouldBe asBag(xs ++ ys)
  }

  "distinct" should "dedup" in {
    bag(xs).distinct.collect().sorted shouldBe xs.distinct.sorted
  }

  "intersect/except" should "use distinct set semantics" in {
    bag(xs).intersect(bag(ys)).collect().sorted shouldBe
      xs.distinct.intersect(ys.distinct).sorted
    bag(xs).except(bag(ys)).collect().sorted shouldBe
      xs.distinct.diff(ys.distinct).sorted
  }

  "intersectAll/exceptAll" should "use multiset (bag) semantics" in {
    // Seq.diff/intersect ARE multiset ops — the exact contract exceptAll/
    // intersectAll must match on a duplicate-heavy input
    val as = Seq(1, 1, 1, 2, 2, 3, 5)
    val bs = Seq(1, 2, 2, 2, 4)
    bag(as).exceptAll(bag(bs)).collect().sorted shouldBe as.diff(bs).sorted
    bag(as).intersectAll(bag(bs)).collect().sorted shouldBe
      as.intersect(bs).sorted
  }

  "folds" should "match Seq equivalents incl. empty-bag edge cases" in {
    val b = bag(xs)
    b.size shouldBe xs.size
    b.count(_ > 2) shouldBe xs.count(_ > 2)
    b.sum shouldBe xs.sum
    b.product shouldBe xs.product
    b.min shouldBe xs.min
    b.max shouldBe xs.max
    b.isEmpty shouldBe false
    b.nonEmpty shouldBe true
    b.exists(_ == 5) shouldBe true
    b.exists(_ == 9) shouldBe false
    b.forall(_ > 0) shouldBe true
    b.find(_ == 3) shouldBe Some(3)
    b.find(_ == 9) shouldBe None
    b.top(3) shouldBe List(5, 5, 5)
    b.bottom(2) shouldBe List(1, 2)
    b.reduce(0)(_ + _) shouldBe xs.sum
    b.reduceOption(math.max) shouldBe Some(xs.max)
    b.fold(Alg2(Size, Sum(implicitly[Numeric[Int]]))) shouldBe ((xs.size.toLong, xs.sum))
    b.fold(Alg8(Size, Sum(implicitly[Numeric[Int]]), Min(Ordering.Int),
      Max(Ordering.Int), Count[Int](_ > 2), Product(implicitly[Numeric[Int]]),
      Top(2, Ordering.Int), Exists[Int](_ == 3))) shouldBe
      ((xs.size.toLong, xs.sum, Some(xs.min), Some(xs.max), xs.count(_ > 2).toLong,
        xs.product, xs.sorted.reverse.take(2), xs.contains(3)))
    b.foldAll(Size, Sum(implicitly[Numeric[Int]]), Min(Ordering.Int)) shouldBe
      Seq(xs.size.toLong, xs.sum, Some(xs.min))

    val e = DataBag.empty[Int]
    e.size shouldBe 0
    e.isEmpty shouldBe true
    e.sum shouldBe 0
    e.reduceOption(_ + _) shouldBe None
    e.top(3) shouldBe Nil
    an[Exception] should be thrownBy e.min
  }

  "groupBy (nested)" should "materialize groups" in {
    val groups = bag(xs).groupBy(_ % 2).collect()
      .map(g => g.key -> g.values.sorted).toMap
    groups shouldBe xs.groupBy(_ % 2).view.mapValues(_.sorted).toMap
  }

  "foldGroup" should "fuse per-group aggregation" in {
    val r = bag(xs).foldGroup[Int, Int](_ % 2, Sum(implicitly[Numeric[Int]]))
      .collect().map(g => g.key -> g.values).toMap
    r shouldBe xs.groupBy(_ % 2).view.mapValues(_.sum).toMap
  }

  it should "lower Size/Sum/Min/Max to a codegen HashAggregate (no object buffers)" in {
    val b = DataBag((1L to 100L).toSeq)
    def plan(d: DataBag[_]): String = d.toDF.queryExecution.executedPlan.toString
    val sized = b.foldGroup(_ % 7, Size)
    val summed = b.foldGroup(_ % 7, Sum(implicitly[Numeric[Long]]))
    val mind = b.foldGroup(_ % 7, Min(Ordering.Long))
    for (p <- Seq(plan(sized), plan(summed), plan(mind))) {
      p should include("HashAggregate")
      p should include("partial_")
      p should not include "ObjectHashAggregate"
      p should not include "SortAggregate"
      p should not include "SerializeFromObject"
    }
    sized.collect().map(g => (g.key, g.values)).sorted shouldBe
      (1L to 100L).groupBy(_ % 7).map { case (k, v) => (k, v.size.toLong) }.toSeq.sorted
    summed.collect().map(g => (g.key, g.values)).sorted shouldBe
      (1L to 100L).groupBy(_ % 7).map { case (k, v) => (k, v.sum) }.toSeq.sorted
    mind.collect().map(g => (g.key, g.values)).sortBy(_._1) shouldBe
      (1L to 100L).groupBy(_ % 7).map { case (k, v) => (k, Some(v.min)) }.toSeq.sortBy(_._1)
  }

  it should "keep the generic path for custom orderings, with identical results" in {
    val b = DataBag((1L to 50L).toSeq)
    val revOrd = Ordering.Long.reverse
    val got = b.foldGroup(_ % 5, Min(revOrd))
      .collect().map(g => (g.key, g.values)).sortBy(_._1)
    got shouldBe (1L to 50L).groupBy(_ % 5)
      .map { case (k, v) => (k, Some(v.max)) }.toSeq.sortBy(_._1)
  }

  "equiJoin" should "match Seq join incl. duplicates" in {
    val l = Seq((1, "a"), (2, "b"), (2, "B"), (3, "c"))
    val r = Seq((2, 20.0), (3, 30.0), (3, 33.0), (4, 40.0))
    val got = DataBag(l).equiJoin(DataBag(r))(_._1, _._1).collect()
    val exp = for { a <- l; b <- r if a._1 == b._1 } yield (a, b)
    asBag(got) shouldBe asBag(exp)
  }

  "leftOuterJoin" should "keep unmatched left rows as None" in {
    val l = Seq((1, "a"), (2, "b"))
    val r = Seq((2, 20.0))
    val got = DataBag(l).leftOuterJoin(DataBag(r))(_._1, _._1).collect()
    asBag(got) shouldBe asBag(Seq(((1, "a"), None), ((2, "b"), Some((2, 20.0)))))
  }

  "semiJoin/antiJoin" should "filter by key existence" in {
    val l = Seq((1, "a"), (2, "b"), (3, "c"))
    val r = Seq((2, "x"), (2, "y"))
    DataBag(l).semiJoin(DataBag(r))(_._1, _._1).collect().sorted shouldBe Seq((2, "b"))
    DataBag(l).antiJoin(DataBag(r))(_._1, _._1).collect().sorted shouldBe
      Seq((1, "a"), (3, "c"))
  }

  "joins" should "match None keys null-safely (reference Scala == semantics)" in {
    // the reference derives joins from Scala `k1(x) == k2(y)` guards, where
    // None == None is true; generated joins use eqNullSafe (SparkExp.scala:87-90)
    val l = Seq((Some(1), "a"), (None: Option[Int], "b"))
    val r = Seq((Some(1), 1.0), (None: Option[Int], 2.0))
    val got = DataBag(l).equiJoin(DataBag(r))(_._1, _._1).collect()
    asBag(got.map { case (x, y) => (x._2, y._2) })  shouldBe
      asBag(Seq(("a", 1.0), ("b", 2.0)))
    DataBag(l).semiJoin(DataBag(r.filter(_._1.isEmpty)))(_._1, _._1)
      .collect().map(_._2) shouldBe Seq("b")
  }

  it should "support composite (tuple) keys" in {
    val l = Seq((1, "a"), (2, "b"), (2, "c"))
    val r = Seq((2, "b", 9.0), (7, "z", 1.0))
    DataBag(l).semiJoin(DataBag(r))(x => (x._1, x._2), y => (y._1, y._2))
      .collect() shouldBe Seq((2, "b"))
    DataBag(l).antiJoin(DataBag(r))(x => (x._1, x._2), y => (y._1, y._2))
      .collect().sorted shouldBe Seq((1, "a"), (2, "c"))
  }

  "named integral folds" should "route to a Catalyst HashAggregate and agree with Seq" in {
    import scala.collection.mutable
    val plans = mutable.ArrayBuffer.empty[String]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        plans.synchronized { plans += qe.executedPlan.toString }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    val xs = Seq(4L, 1L, 3L, 2L, 4L)
    val b = DataBag(xs)
    b.sum shouldBe xs.sum
    b.min shouldBe xs.min
    b.max shouldBe xs.max
    DataBag(Seq.empty[Long]).sum shouldBe 0L
    bag(Seq(7, -2, 9)).sum shouldBe 14 // Int stays Int
    spark.listenerManager.register(listener)
    try {
      b.sum shouldBe xs.sum
      val deadline = System.nanoTime + 10L * 1000 * 1000 * 1000
      while (plans.synchronized(plans.isEmpty) && System.nanoTime < deadline)
        Thread.sleep(50)
      val got = plans.synchronized(plans.toVector)
      got should not be empty
      // the fold ran as a SQL aggregate, not a deserializing RDD fold
      got.exists(_.contains("HashAggregate")) shouldBe true
      got.foreach(_ should not include "DeserializeToObject")
    } finally spark.listenerManager.unregister(listener)
    // custom orderings keep the exact RDD-fold semantics
    b.minBy(x => -x) shouldBe Some(4L)
    b.min(Ordering.Long.reverse) shouldBe 4L
  }

  "cross" should "produce the cartesian product" in {
    val got = bag(Seq(1, 2)).cross(bag(Seq(3, 4))).collect()
    asBag(got) shouldBe asBag(Seq((1, 3), (1, 4), (2, 3), (2, 4)))
  }

  "sample" should "be deterministic under a fixed seed and bounded by k" in {
    val b = bag((1 to 1000).toSeq)
    val s1 = b.sample(7, 123L)
    val s2 = b.sample(7, 123L)
    s1 shouldBe s2
    s1.size shouldBe 7
    s1.toSet.subsetOf((1 to 1000).toSet) shouldBe true
    bag(Seq(1, 2)).sample(10, 1L).sorted shouldBe Vector(1, 2)
  }

  it should "keep the k-element contract when partitions are empty" in {
    // Regression: empty partitions duplicate values in the cumulative bounds
    // array, and an exact binarySearch hit could attribute a chosen position
    // to an empty reservoir — silently returning fewer than k elements.
    // parallelize(3 elems, 10 slices) yields sizes [0,0,0,1,0,0,1,0,0,1].
    val ds = spark.createDataset(spark.sparkContext.parallelize(Seq(1, 2, 3), 10))
    for (seed <- 1L to 20L)
      DataBag.from(ds).sample(3, seed).sorted shouldBe Vector(1, 2, 3)
    DataBag.from(ds).sample(2, 9L).size shouldBe 2
  }

  it should "pin RanHash draws (independently recomputed golden values)" in {
    // goldens verified by an independent big-int simulation of the
    // Numerical Recipes Ranhash mix — guards the exact reference draws
    RanHash(42L).at(0).next() shouldBe 0.2892343203114126
    RanHash(42L).at(1).next() shouldBe 0.2621263456410165
    RanHash(42L).at(2).next() shouldBe 0.9007186315067137
    RanHash(5394826801L).at(0).next() shouldBe 0.12750823460175326
    RanHash(5394826801L).at(7).next() shouldBe 0.24606132331474173
    RanHash(123L).at(1000000L).next() shouldBe 0.29012657583168056
    // streaming: next() advances one position
    val r = RanHash(42L).at(0)
    r.next() shouldBe 0.2892343203114126
    r.next() shouldBe 0.2621263456410165
    val b = RanHash(42L).at(0).skip(2)
    b.next() shouldBe 0.9007186315067137
  }

  it should "equal a sequential reference-reservoir pass over the indexed stream" in {
    // the emma-Spark sample semantics: element at global index i draws
    // j = RanHash(seed).at(i).nextLong(i+1), keeps when j < k, last write
    // per slot wins — simulated here sequentially and compared exactly
    def twin[A](indexed: Seq[(A, Long)], k: Int, seed: Long): Vector[A] = {
      val slots = Array.fill(k)(Option.empty[A])
      indexed.sortBy(_._2).foreach { case (e, i) =>
        if (i < k) slots(i.toInt) = Some(e)
        else {
          val j = RanHash(seed).at(i).nextLong(i + 1)
          if (j < k) slots(j.toInt) = Some(e)
        }
      }
      slots.toVector.flatten
    }
    for (parts <- Seq(1, 3, 8); seed <- Seq(42L, 5394826801L)) {
      val ds = spark.createDataset(
        spark.sparkContext.parallelize((1 to 500).map(i => i * 11), parts))
      val indexed = ds.rdd.zipWithIndex().collect().toSeq
      withClue(s"parts=$parts seed=$seed: ") {
        DataBag.from(ds).sample(9, seed) shouldBe twin(indexed, 9, seed)
      }
    }
  }

  it should "sample without replacement, roughly uniformly across the range" in {
    val b = bag((1 to 1000).toSeq)
    val draws = (1 to 20).flatMap { s => val v = b.sample(50, s.toLong); v.size shouldBe 50; v.distinct.size shouldBe 50; v }
    // 1000 draws from Uniform(1,1000): mean 500.5, sd of the mean ~9.1
    val mean = draws.sum.toDouble / draws.size
    mean shouldBe 500.5 +- 50.0
  }

  "zipWithIndex" should "assign dense unique indices" in {
    val r = bag(xs).zipWithIndex().collect()
    r.map(_._2).sorted shouldBe (0L until xs.size).toVector
    asBag(r.map(_._1)) shouldBe asBag(xs)
  }

  "bagEquals" should "be order-insensitive multiset equality" in {
    bag(Seq(1, 2, 2)).bagEquals(bag(Seq(2, 1, 2))) shouldBe true
    bag(Seq(1, 2, 2)).bagEquals(bag(Seq(1, 2))) shouldBe false
  }

  "CSV and Parquet IO" should "round-trip typed records" in {
    // note: empty strings don't survive CSV (written unquoted-empty, read back
    // as null via nullValue="") — same ambiguity the reference CSV codec has;
    // null/None round-trips via Option fields.
    val recs = Seq(Rec(1, "a,b", Some(1.5)), Rec(2, "c", None), Rec(3, "d", Some(-2.0)))
    val dir = java.nio.file.Files.createTempDirectory("graft_io").toString
    implicit val enc: org.apache.spark.sql.Encoder[Rec] = Encoders.product[Rec]

    DataBag.from(spark.createDataset(recs)).writeCSV(s"$dir/csv", CSV(header = true))
    val csvBack = DataBag.readCSV[Rec](s"$dir/csv", CSV(header = true)).collect()
    asBag(csvBack.map(r => (r.id, r.s))) shouldBe asBag(recs.map(r => (r.id, r.s)))

    DataBag.from(spark.createDataset(recs)).writeParquet(s"$dir/pq")
    val pqBack = DataBag.readParquet[Rec](s"$dir/pq").collect()
    asBag(pqBack) shouldBe asBag(recs)
  }

  "Parquet IO" should "round-trip randomized nested/Option/Seq records (reference codec coverage)" in {
    val rnd = new scala.util.Random(99)
    def str() = rnd.alphanumeric.take(rnd.nextInt(8)).mkString
    val recs = Seq.fill(200)(RichRec(
      rnd.nextLong(),
      Inner(rnd.nextInt(), str()),
      Seq.fill(rnd.nextInt(4))(str()),
      Seq.fill(rnd.nextInt(4))(rnd.nextInt()),
      if (rnd.nextBoolean()) Some(Inner(rnd.nextInt(), str())) else None))
    val dir = java.nio.file.Files.createTempDirectory("graft_rich").toString
    implicit val enc: org.apache.spark.sql.Encoder[RichRec] = Encoders.product[RichRec]
    DataBag.from(spark.createDataset(recs)).writeParquet(s"$dir/pq")
    val back = DataBag.readParquet[RichRec](s"$dir/pq").collect()
    asBag(back) shouldBe asBag(recs)
  }

  "readText" should "read lines" in {
    val dir = java.nio.file.Files.createTempDirectory("graft_txt").toString
    DataBag(Seq("line one", "line two")).writeText(s"$dir/t")
    DataBag.readText(s"$dir/t").collect().sorted shouldBe Seq("line one", "line two")
  }
}

case class Rec(id: Int, s: String, d: Option[Double])
case class Inner(a: Int, b: String)
case class RichRec(id: Long, inner: Inner, tags: Seq[String], xs: Seq[Int], opt: Option[Inner])
