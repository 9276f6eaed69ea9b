package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Token-budget water-filling: the closed-form prefix allocation against the
  * ITERATIVE definition (cap, redistribute, repeat), plus goldens and the
  * materialization invariants. */
class MixtureSpec extends AnyFlatSpec with Matchers {

  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  behavior of "Mixture.allocate"

  /** The textbook fixpoint loop `allocate` must equal: proportional shares,
    * cap everything over-subscribed, redistribute, until no new caps. */
  private def iterativeAllocate(counts: Seq[(String, Long)],
      weights: Map[String, Double], budgetTokens: Long,
      maxEpochs: Double): Map[String, BigInt] = {
    val micro = BigInt(1000000)
    val e = BigInt(math.floor(maxEpochs * 1e6 + 0.5).toLong)
    val w = weights.map { case (d, x) => d -> BigInt(math.floor(x * 1e6 + 0.5).toLong) }
    var active = counts.filter { case (d, n) => w.contains(d) && n > 0 }.toMap
    val caps = active.map { case (d, n) => d -> BigInt(n) * e }
    var alloc = Map.empty[String, BigInt]
    var remB = BigInt(budgetTokens) * micro
    var done = false
    while (!done && active.nonEmpty) {
      val wSum = active.keys.map(w).sum
      val over = active.keys.filter(d => w(d) * remB >= caps(d) * wSum).toSeq
      if (over.isEmpty) done = true
      else over.foreach { d => alloc += d -> caps(d); remB -= caps(d); active -= d }
    }
    val wSum = active.keys.map(w).sum
    active.keys.foreach { d =>
      alloc += d -> (if (wSum == 0) BigInt(0) else w(d) * remB / wSum)
    }
    alloc
  }

  it should "match hand-computed allocations" in {
    val got = Mixture.allocate(
      Seq("a" -> 100L, "b" -> 1000L), Map("a" -> 3.0, "b" -> 1.0),
      budgetTokens = 1000L, maxEpochs = 2.0)
      .map(a => a.domain -> ((a.alloc_tokens, a.epochs_micros, a.capped))).toMap
    got("a") shouldBe ((200L, 2000000L, true))
    got("b") shouldBe ((800L, 800000L, false))
  }

  it should "leave everything uncapped when the budget fits" in {
    val got = Mixture.allocate(
      Seq("a" -> 100L, "b" -> 100L), Map("a" -> 1.0, "b" -> 1.0),
      budgetTokens = 300L, maxEpochs = 2.0)
      .map(a => a.domain -> ((a.alloc_tokens, a.epochs_micros, a.capped))).toMap
    got("a") shouldBe ((150L, 1500000L, false))
    got("b") shouldBe ((150L, 1500000L, false))
  }

  it should "cap every domain when the budget exceeds all caps" in {
    val got = Mixture.allocate(
      Seq("a" -> 10L, "b" -> 20L), Map("a" -> 1.0, "b" -> 1.0),
      budgetTokens = 1000L, maxEpochs = 1.5)
    got.forall(_.capped) shouldBe true
    got.map(a => a.domain -> a.alloc_tokens).toMap shouldBe
      Map("a" -> 15L, "b" -> 30L)
  }

  it should "reject weights that round to zero micro-units" in {
    // a zero micro-weight would make the capping test vacuous and hand the
    // domain its full cap regardless of budget
    an[IllegalArgumentException] should be thrownBy
      Mixture.allocate(Seq("a" -> 100L), Map("a" -> 1e-9),
        budgetTokens = 10L, maxEpochs = 2.0)
  }

  it should "ignore unweighted and empty domains" in {
    val got = Mixture.allocate(
      Seq("a" -> 100L, "zero" -> 0L, "noweight" -> 50L),
      Map("a" -> 1.0, "zero" -> 1.0), budgetTokens = 50L, maxEpochs = 2.0)
    got.map(_.domain) shouldBe Seq("a")
    got.head.alloc_tokens shouldBe 50L
  }

  it should "equal the iterative water-filling fixpoint on 200 random configs" in {
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 0 until 200) {
      val k = 1 + rnd.nextInt(8)
      val counts = (0 until k).map(i => s"d$i" -> (1L + rnd.nextInt(1000)))
      val weights = (0 until k).map(i => s"d$i" -> (0.001 + rnd.nextDouble() * 10)).toMap
      val budget = rnd.nextInt(3 * counts.map(_._2.toInt).sum + 1).toLong
      val maxE = Seq(0.5, 1.0, 2.5, 3.75)(rnd.nextInt(4))
      val expect = iterativeAllocate(counts, weights, budget, maxE)
      val got = Mixture.allocate(counts, weights, budget, maxE)
      withClue(s"trial $trial counts=$counts budget=$budget maxE=$maxE: ") {
        got.map(_.domain).toSet shouldBe expect.keySet
        got.foreach { a =>
          a.alloc_tokens shouldBe (expect(a.domain) / 1000000).toLong
          a.epochs_micros shouldBe (expect(a.domain) / BigInt(a.n_tokens)).toLong
        }
        // global invariants
        val totalAlloc = got.map(_.alloc_tokens).sum
        assert(totalAlloc <= budget)
        got.foreach { a =>
          assert(a.epochs_micros <= math.floor(maxE * 1e6 + 0.5).toLong)
        }
      }
    }
  }

  behavior of "Mixture.applyAllocation"

  private val df = (1L to 200L).map(i => (i, if (i % 2 == 0) "ev" else "od"))
    .toDF("id", "dom")

  it should "emit dense epochs 0..c-1 with c in {floor(e), floor(e)+1}" in {
    val allocs = Seq(
      Mixture.DomainAlloc("ev", 100L, capped = false, 250L, 2500000L),
      Mixture.DomainAlloc("od", 100L, capped = false, 70L, 700000L))
    val out = Mixture.applyAllocation(df, "dom", col("id"), allocs, seed = 3L)
      .groupBy("id", "dom").agg(count(lit(1)).as("c"), max("epoch").as("me"),
        min("epoch").as("mn")).collect()
    out.foreach { r =>
      val (dom, c, me, mn) = (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))
      mn shouldBe 0L
      me shouldBe c - 1 // dense epochs
      val whole = if (dom == "ev") 2L else 0L
      assert(c == whole || c == whole + 1, s"copies $c for whole $whole")
    }
    // fractional part actually fires both ways somewhere
    val evCounts = Mixture.applyAllocation(df, "dom", col("id"), allocs, 3L)
      .where(col("dom") === "ev").groupBy("id").count()
      .select("count").distinct().collect().map(_.getLong(0)).toSet
    evCounts shouldBe Set(2L, 3L)
  }

  it should "be deterministic and seed-sensitive" in {
    val allocs = Seq(Mixture.DomainAlloc("ev", 100L, capped = false, 150L, 1500000L),
      Mixture.DomainAlloc("od", 100L, capped = false, 150L, 1500000L))
    def run(seed: Long) =
      Mixture.applyAllocation(df, "dom", col("id"), allocs, seed)
        .select("id", "epoch").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    run(1L) shouldBe run(1L)
    assert(!run(1L).sameElements(run(2L)))
  }

  it should "land E[rows] near factor*n (binomial bound)" in {
    val allocs = Seq(Mixture.DomainAlloc("ev", 100L, capped = false, 50L, 500000L),
      Mixture.DomainAlloc("od", 100L, capped = false, 50L, 500000L))
    val n = Mixture.applyAllocation(df, "dom", col("id"), allocs, 11L).count()
    // 200 Bernoulli(0.5) draws: mean 100, sd ~7.1 — allow 5 sd
    assert(math.abs(n - 100L) <= 36, s"got $n")
  }
}
