package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Runtime quotation: a pipeline assembled as SOURCE TEXT compiles in-JVM
  * (toolbox), the comprehension macro expands during that compilation, and
  * the resulting closure runs on the live session with the same plan and
  * values as build-time-compiled code. */
class RuntimeQuotationSpec extends AnyFlatSpec with Matchers {

  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  behavior of "RuntimeQuotation.compile"

  it should "derive the comprehension join inside a runtime-compiled snippet" in {
    val pipeline = RuntimeQuotation.compile[SparkSession => DataFrame]("""
      (s0: org.apache.spark.sql.SparkSession) => {
        implicit val spark: org.apache.spark.sql.SparkSession = s0
        import spark.implicits._
        import graft.api._
        import graft.api.comprehensions.onSpark
        val xs = DataBag((1L to 50L).toSeq)
        val ys = DataBag(Seq(2L, 4L, 6L, 8L, 10L, 12L))
        onSpark {
          for { x <- xs; y <- ys; if x % 7 == y % 5 } yield (x, y, x + y)
        }.ds.toDF("x", "y", "s")
      }""")
    val out = pipeline(spark)
    val plan = out.queryExecution.executedPlan.toString
    plan should not include regex("(?i)cartesian")
    plan should not include regex("(?i)BroadcastNestedLoop")
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val exp = (for {
      x <- 1L to 50L; y <- Seq(2L, 4L, 6L, 8L, 10L, 12L); if x % 7 == y % 5
    } yield (x, y, x + y)).sorted
    got shouldBe exp.toArray
  }

  it should "derive EXISTS guards and correlated folds in runtime-compiled snippets" in {
    // the round's new derivations ride the same macro, so the source-text
    // channel must carry them too: semi join + fold-group sumJoin
    val pipeline = RuntimeQuotation.compile[SparkSession => DataFrame]("""
      (s0: org.apache.spark.sql.SparkSession) => {
        implicit val spark: org.apache.spark.sql.SparkSession = s0
        import spark.implicits._
        import graft.api._
        import graft.api.comprehensions.onSpark
        val xs = DataBag((1L to 30L).toSeq)
        val ys = DataBag(Seq(2L, 4L, 4L, 6L))
        onSpark {
          for { x <- xs; if ys.exists(y => y == x % 7) }
            yield (x, ys.count(y => y == x % 7))
        }.ds.toDF("x", "n")
      }""")
    val out = pipeline(spark)
    out.queryExecution.executedPlan.toString should include("LeftSemi")
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val yseq = Seq(2L, 4L, 4L, 6L)
    val exp = (for { x <- 1L to 30L; if yseq.exists(y => y == x % 7) }
      yield (x, yseq.count(y => y == x % 7).toLong)).sorted
    got shouldBe exp.toArray
  }

  it should "unnest dependent nested-comprehension generators at runtime" in {
    // UnnestGenerator rides the same macro through the source-text channel
    val pipeline = RuntimeQuotation.compile[SparkSession => DataFrame]("""
      (s0: org.apache.spark.sql.SparkSession) => {
        implicit val spark: org.apache.spark.sql.SparkSession = s0
        import spark.implicits._
        import graft.api._
        import graft.api.comprehensions.onSpark
        val xs = DataBag((1L to 20L).toSeq)
        val ys = DataBag((1L to 15L).toSeq)
        onSpark {
          for {
            x <- xs
            (a, b) <- (for { y <- ys; if y % 5 == x % 5 } yield (y, y * x))
            if b % 2 == 0L
          } yield (x, a, b)
        }.ds.toDF("x", "a", "b")
      }""")
    val out = pipeline(spark)
    out.queryExecution.executedPlan.toString should not include regex("(?i)cartesian")
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val exp = (for {
      x <- 1L to 20L
      (a, b) <- (for { y <- 1L to 15L; if y % 5 == x % 5 } yield (y, y * x))
      if b % 2 == 0L
    } yield (x, a, b)).sorted
    got shouldBe exp.toArray
  }

  it should "derive depth-3 chains and block spellings at runtime" in {
    // the deep default-case pass and per-level unnest re-expansion ride
    // the same macro through the source-text channel
    val pipeline = RuntimeQuotation.compile[SparkSession => DataFrame]("""
      (s0: org.apache.spark.sql.SparkSession) => {
        implicit val spark: org.apache.spark.sql.SparkSession = s0
        import spark.implicits._
        import graft.api._
        import graft.api.comprehensions.onSpark
        val xs = DataBag((1L to 12L).toSeq)
        val ys = DataBag((1L to 10L).toSeq)
        val zs = DataBag((1L to 8L).toSeq)
        onSpark {
          val deep = for {
            x <- xs
            v <- (for {
              y <- ys
              if y % 4 == x % 4
              w <- (for { z <- zs; if z % 3 == y % 3 } yield z + y)
            } yield w + x)
          } yield (x, v)
          val flat = for { x <- xs; y <- ys; if x % 5 == y % 5 } yield (x, x + y)
          deep union flat
        }.ds.toDF("x", "v")
      }""")
    val out = pipeline(spark)
    out.queryExecution.executedPlan.toString should not include regex("(?i)cartesian")
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val deepExp = for {
      x <- 1L to 12L
      y <- 1L to 10L; if y % 4 == x % 4
      z <- 1L to 8L; if z % 3 == y % 3
    } yield (x, (z + y) + x)
    val flatExp = for { x <- 1L to 12L; y <- 1L to 10L; if x % 5 == y % 5 }
      yield (x, x + y)
    got shouldBe (deepExp ++ flatExp).sorted.toArray
  }

  it should "fuse groupBy spellings (block vals, patterns, multi-group) at runtime" in {
    // the round's groupBy-fusion spellings ride the same macro through the
    // source-text channel: block-val aliases, the Group pattern, and two
    // groupBys joined on key must all fuse (no MapGroups) and agree with Seq
    val pipeline = RuntimeQuotation.compile[SparkSession => DataFrame]("""
      (s0: org.apache.spark.sql.SparkSession) => {
        implicit val spark: org.apache.spark.sql.SparkSession = s0
        import spark.implicits._
        import graft.api._
        import graft.api.comprehensions.onSpark
        val xs = DataBag((1L to 60L).map(i => (i % 8, i)))
        val ys = DataBag((1L to 40L).map(i => (i % 8, i * 3)))
        onSpark {
          for {
            Group(k1, v1) <- xs.groupBy(_._1)
            g2 <- ys.groupBy(_._1)
            if k1 == g2.key
          } yield {
            val vs2 = g2.values
            (k1, v1.size, vs2.map(_._2).sum)
          }
        }.ds.toDF("k", "n1", "s2")
      }""")
    val out = pipeline(spark)
    out.queryExecution.executedPlan.toString should not include "MapGroups"
    val got = out.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    val xref = (1L to 60L).map(i => (i % 8, i)).groupBy(_._1)
    val yref = (1L to 40L).map(i => (i % 8, i * 3)).groupBy(_._1)
    val exp = (for {
      (k1, v1) <- xref.toSeq
      (k2, v2) <- yref.toSeq
      if k1 == k2
    } yield (k1, v1.size, v2.map(_._2).sum)).sorted
    got shouldBe exp.toArray
  }

  it should "evaluate plain expressions and reusable closures" in {
    RuntimeQuotation.compile[Long]("40L + 2L") shouldBe 42L
    val f = RuntimeQuotation.compile[Long => Long]("(n: Long) => n * n")
    f(9L) shouldBe 81L
  }

  it should "skip the compiler on identical re-submission (source-hash cache)" in {
    val src = "(n: Long) => n + " + System.nanoTime() + "L" // unique source
    val before = RuntimeQuotation.compilations.get()
    val f1 = RuntimeQuotation.compile[Long => Long](src)
    RuntimeQuotation.compilations.get() shouldBe (before + 1)
    val t0 = System.nanoTime()
    val f2 = RuntimeQuotation.compile[Long => Long](src)
    val hitMs = (System.nanoTime() - t0) / 1e6
    // second submission compiled NOTHING: the scalac counter is unchanged
    // and the hit path is orders of magnitude under a compiler run
    RuntimeQuotation.compilations.get() shouldBe (before + 1)
    hitMs should be < 500.0
    f1(1L) shouldBe f2(1L)
    // distinct source is a distinct cache entry
    RuntimeQuotation.compile[Long]("41L + 1L") shouldBe 42L
    RuntimeQuotation.compilations.get() shouldBe (before + 2)
  }

  it should "consume cross-file @lib defs (incl. GENERIC) from runtime-submitted source" in {
    // the pickled @graftSrc registry read inside the nsc-COMPILED expansion:
    // the runtime compiler is a different Global than the build-time one, so
    // this pins annotation-pickle reading on the runtime channel (q249's
    // contract through RuntimeQuotation)
    val pipeline = RuntimeQuotation.compile[SparkSession => DataFrame]("""
      (s0: org.apache.spark.sql.SparkSession) => {
        implicit val spark: org.apache.spark.sql.SparkSession = s0
        import spark.implicits._
        import graft.api._
        import graft.api.comprehensions.onSpark
        val custs = DataBag(Seq(
          graft.CustRow(1L, "a", 0.0), graft.CustRow(2L, "b", 0.0)))
        val orders = DataBag(Seq(
          graft.OrderRow(10L, 1L, 200000.0), graft.OrderRow(11L, 1L, 100.0),
          graft.OrderRow(12L, 2L, 151000.0), graft.OrderRow(13L, 3L, 500000.0)))
        onSpark {
          for { cu <- custs; o <- graft.lib.QuotedLib.bigOrdersOf(cu, orders) }
            yield (cu.c_custkey, o.o_orderkey)
        }.ds.toDF("ck", "ok")
      }""")
    val out = pipeline(spark)
    out.queryExecution.executedPlan.toString should not include regex("(?i)cartesian")
    out.collect().map(r => (r.getLong(0), r.getLong(1))).sorted shouldBe
      Array((1L, 10L), (2L, 12L))
    // GENERIC @lib member through the same channel: monomorphized from the
    // typed call's type args inside the nsc run
    val gen = RuntimeQuotation.compile[SparkSession => DataFrame]("""
      (s0: org.apache.spark.sql.SparkSession) => {
        implicit val spark: org.apache.spark.sql.SparkSession = s0
        import spark.implicits._
        import graft.api._
        import graft.api.comprehensions.onSpark
        val ks = DataBag((1L to 6L).toSeq)
        val pairs = DataBag((1L to 30L).map(i => (i % 7, "v" + i)))
        onSpark {
          for { k <- ks; p <- graft.lib.QuotedLib.keyedOver(k, pairs) }
            yield (k, p._2)
        }.ds.toDF("k", "v")
      }""")
    val outG = gen(spark)
    outG.queryExecution.executedPlan.toString should not include regex("(?i)cartesian")
    val expG = (for { k <- 1L to 6L; i <- 1L to 30L; if i % 7 == k }
      yield (k, "v" + i)).sorted
    outG.collect().map(r => (r.getLong(0), r.getString(1))).sorted shouldBe expG.toArray
  }

  it should "surface macro aborts as compile errors at quote time" in {
    // dependent on a DISTRIBUTED bag (the literal DataBag(seq) spelling
    // now derives a local flatMap instead — ComprehensionSpec)
    val bad = """
      (s0: org.apache.spark.sql.SparkSession) => {
        implicit val spark: org.apache.spark.sql.SparkSession = s0
        import spark.implicits._
        import graft.api._
        import graft.api.comprehensions.onSpark
        val xs = DataBag((1L to 5L).toSeq)
        val ys = DataBag((1L to 5L).toSeq)
        val zs = DataBag((6L to 9L).toSeq)
        onSpark { for { x <- xs; y <- (if (x > 2L) ys else zs) } yield x + y }.toDF
      }"""
    val e = intercept[Throwable] {
      RuntimeQuotation.compile[SparkSession => DataFrame](bad)
    }
    e.getMessage should include("depends on an earlier generator variable")
  }
}
