package graft.lib

import org.apache.spark.sql.SparkSession
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Golden-graph acceptance tests (reference: fixed 7-node CC graph,
  * triangle/TC fixtures). */
class GraphsSpec extends AnyFlatSpec with Matchers {

  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  "connectedComponents" should "label the reference-style 7-node graph" in {
    // components {1,2,3,4}, {5,6}, isolated-with-self? 7 connects via 7-7? use 7-8
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L), (7L, 8L))
      .toDF("src", "dst")
    val got = Graphs.connectedComponents(edges, spark)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    got shouldBe Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (5L, 5L), (6L, 5L), (7L, 7L), (8L, 7L))
  }

  it should "survive ANSI mode on a few hundred vertices" in {
    // Regression: the convergence digest once summed full-range 64-bit hashes,
    // which throws ARITHMETIC_OVERFLOW under Spark 4's ANSI default as soon as
    // the graph is non-trivial. 400 vertices in rings + chains exercises it.
    val rnd = new scala.util.Random(7)
    val rings = (0 until 10).flatMap { c =>
      val base = c * 30L
      (0 until 30).map(i => (base + i, base + (i + 1) % 30))
    }
    val chains = (0 until 100).map(i => (300L + i, 300L + rnd.nextInt(100)))
    val got = Graphs.connectedComponents(
        (rings ++ chains).toDF("src", "dst"), spark)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // each ring labels to its minimum
    for (c <- 0 until 10; i <- 0 until 30)
      got.find(_._1 == c * 30L + i).get._2 shouldBe c * 30L
    got.length should be >= 400
  }

  "connectedComponentsMutable" should "agree with the DataFrame formulation" in {
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 9L), (9L, 1L))
    val a = Graphs.connectedComponentsMutable(edges.toDS(), spark)
      .collect().sorted
    val b = Graphs.connectedComponents(edges.toDF("src", "dst"), spark)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    a shouldBe b
  }

  "connectedComponentsAlternating" should "agree with min-label CC on random graphs" in {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 5) {
      val n = 30 + trial * 10
      val edges = Seq.fill(n)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter { case (a, b) => a != b }
      val df = edges.toDF("src", "dst")
      val simple = Graphs.connectedComponents(df, spark)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      val alt = Graphs.connectedComponentsAlternating(df, spark)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      withClue(s"trial $trial (n=$n): ") { alt shouldBe simple }
    }
  }

  it should "handle a long chain in few rounds" in {
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = Graphs.connectedComponentsAlternating(chain, spark)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    got.length shouldBe 64
    got.forall(_._2 == 0L) shouldBe true
  }

  it should "survive ANSI mode on a few hundred vertices" in {
    // Same regression class as the min-label variant: the convergence digest
    // must not sum full-range 64-bit hashes (ANSI ARITHMETIC_OVERFLOW).
    val rnd = new scala.util.Random(11)
    val rings = (0 until 8).flatMap { c =>
      val base = c * 40L
      (0 until 40).map(i => (base + i, base + (i + 1) % 40))
    }
    val chains = (0 until 120).map(i => (320L + i, 320L + rnd.nextInt(120)))
    val got = Graphs.connectedComponentsAlternating(
        (rings ++ chains).toDF("src", "dst"), spark)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    for (c <- 0 until 8; i <- 0 until 40)
      got.find(_._1 == c * 40L + i).get._2 shouldBe c * 40L
    // a few chain edges may be self-loops (rnd hits its own index) and drop
    got.length should be >= 430
  }

  "transitiveClosure" should "close a chain" in {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDS()
    Graphs.transitiveClosure(edges).collect().sorted shouldBe
      Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
  }

  "pageRankScaled" should "hold a cycle at the fixed point and match hand-computed ranks" in {
    // 3-cycle: every vertex forwards its full rank, so rank stays exactly
    // 1.0*scale forever (0.15*S + (85*S) div 100 == S with S = 10^9)
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    Graphs.pageRankScaled(cycle, iterations = 5).collect()
      .map(_.getLong(1)).toSeq shouldBe Seq.fill(3)(1000000000L)
    // star: b->a, c->a, a->b; two hand-computed rounds
    val star = Seq((2L, 1L), (3L, 1L), (1L, 2L)).toDF("src", "dst")
    val r = Graphs.pageRankScaled(star, iterations = 2).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    r(1L) shouldBe 1127500000L
    r(2L) shouldBe 1722500000L
    r(3L) shouldBe 150000000L
  }

  "bfsHops" should "compute bounded min-hop distances on a chain with a shortcut" in {
    // 0→1→2→3→4→5 plus shortcut 0→3: d(3)=1 via the shortcut, not 3
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (0L, 3L))
      .toDF("src", "dst")
    val sources = Seq(0L).toDF("vertex")
    val got = Graphs.bfsHops(edges, sources, maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    got shouldBe Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 1, 4L -> 2, 5L -> 3)
  }

  "shortestPathsBounded" should "prefer a cheap 2-hop path over an expensive direct edge" in {
    // 0→2 direct costs 10; 0→1→2 costs 3; 2→3 within bound; self-loops absent
    val edges = Seq((0L, 2L, 10L), (0L, 1L, 1L), (1L, 2L, 2L), (2L, 3L, 5L))
      .toDF("src", "dst", "w")
    val got = Graphs.shortestPathsBounded(edges, Seq(0L).toDF("vertex"), maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(0L -> 0L, 1L -> 1L, 2L -> 3L, 3L -> 8L)
    // with maxHops = 1 only direct edges count
    Graphs.shortestPathsBounded(edges, Seq(0L).toDF("vertex"), maxHops = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe
      Map(0L -> 0L, 1L -> 1L, 2L -> 10L)
  }

  it should "stop at maxHops and handle unreachable vertices" in {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (8L, 9L)).toDF("src", "dst")
    val got = Graphs.bfsHops(edges, Seq(0L).toDF("vertex"), maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    got shouldBe Map(0L -> 0, 1L -> 1, 2L -> 2) // 3 beyond bound, 8/9 unreachable
  }

  "triangles" should "enumerate each triangle once" in {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 1L),
      (5L, 6L)).toDF("src", "dst")
    val got = Graphs.triangles(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    got shouldBe Seq((1L, 2L, 3L), (1L, 3L, 4L))
  }
}
