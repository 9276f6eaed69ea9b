package graft.api

import org.apache.spark.sql.SparkSession
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.api.comprehensions.onSpark

/** Randomized-data differential for the macro derivations: a fixed set of
  * comprehension SHAPES (the shapes are compile-time; the data and the
  * closure-captured parameters vary per trial) must match the plain Seq
  * semantics of the same comprehension. Complements ComprehensionSpec's
  * targeted cases the way FuzzDifferentialSpec backs DataBagSpec. */
class ComprehensionFuzzSpec extends AnyFlatSpec with Matchers {

  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def bag(s: Seq[Long]): DataBag[Long] = DataBag(s)

  behavior of "onSpark derivations under randomized data"

  it should "match Seq semantics across joins, EXISTS, folds, and group fusion" in {
    val rnd = new scala.util.Random(20260814L)
    def draw(n: Int, bound: Long): Seq[Long] =
      Seq.fill(n)(math.floorMod(rnd.nextLong(), bound))
    for (trial <- 1 to 5) {
      withClue(s"trial $trial: ") {
        val xsSeq = draw(30 + rnd.nextInt(30), 40)
        val ysSeq = draw(20 + rnd.nextInt(20), 15)
        val zsSeq = draw(10 + rnd.nextInt(10), 60)
        val xs = bag(xsSeq); val ys = bag(ysSeq); val zs = bag(zsSeq)
        val m = 2L + rnd.nextInt(7) // closure-captured join modulus
        val t = 1L + rnd.nextInt(3) // fold-guard threshold

        // join + EXISTS guard + correlated head count
        val r1 = onSpark {
          for { x <- xs; y <- ys; if x % m == y % m; if zs.exists(z => z == x + y) }
            yield (x, y, ys.count(w => w == x % 7))
        }
        val e1 = for { x <- xsSeq; y <- ysSeq; if x % m == y % m
          if zsSeq.exists(z => z == x + y) }
          yield (x, y, ysSeq.count(w => w == x % 7).toLong)
        r1.collect().sorted shouldBe e1.sorted

        // NOT EXISTS + nested-comprehension sum + HAVING-style fold guard
        val r2 = onSpark {
          for { x <- xs; if !ys.exists(y => y == x % 9)
                if zs.count(z => z % m == x % m) >= t }
            yield (x, (for { y <- ys; if y % 5 == x % 5 } yield y * 3L).sum)
        }
        val e2 = for { x <- xsSeq; if !ysSeq.exists(y => y == x % 9)
          if zsSeq.count(z => z % m == x % m) >= t }
          yield (x, ysSeq.filter(y => y % 5 == x % 5).map(_ * 3L).sum)
        r2.collect().sorted shouldBe e2.sorted

        // correlated top-k (List value consumed by local code)
        val r3 = onSpark {
          for { x <- xs } yield (x, ys.withFilter(y => y % 4 == x % 4).top(2).sum)
        }
        val e3 = for { x <- xsSeq }
          yield (x, ysSeq.filter(y => y % 4 == x % 4).sorted.reverse.take(2).sum)
        r3.collect().sorted shouldBe e3.sorted

        // groupBy fusion with filter/map stages and a HAVING guard
        val r4 = onSpark {
          for { g <- xs.groupBy(v => v % m); if g.values.size >= 2 }
            yield (g.key, g.values.size, g.values.filter(_ > 10L).map(_ * 2L).sum,
              g.values.min)
        }
        val e4 = xsSeq.groupBy(_ % m).toSeq.collect {
          case (k, vs) if vs.size >= 2 =>
            (k, vs.size, vs.filter(_ > 10L).map(_ * 2L).sum, vs.min)
        }
        r4.collect().sorted shouldBe e4.sorted

        // block-val aliases + derived arithmetic over fold results
        val r5 = onSpark {
          for { g <- xs.groupBy(v => v % m) } yield {
            val vs = g.values
            val n = vs.size
            (g.key, n, vs.sum * 10L / n, vs.max)
          }
        }
        val e5 = xsSeq.groupBy(_ % m).toSeq.map { case (k, vs) =>
          (k, vs.size, vs.sum * 10L / vs.size, vs.max)
        }
        r5.collect().sorted shouldBe e5.sorted

        // two groupBys joined on key (pattern + plain spellings mixed)
        val r6 = onSpark {
          for {
            Group(k1, v1) <- xs.groupBy(v => v % m)
            g2 <- ys.groupBy(v => v % m)
            if k1 == g2.key
          } yield (k1, v1.size, g2.values.sum)
        }
        val e6 = for {
          (k1, v1) <- xsSeq.groupBy(_ % m).toSeq
          (k2, v2) <- ysSeq.groupBy(_ % m).toSeq
          if k1 == k2
        } yield (k1, v1.size, v2.sum)
        r6.collect().sorted shouldBe e6.sorted

        // global-fold hoist composed with a fused group HAVING
        val r7 = onSpark {
          for { g <- xs.groupBy(v => v % m)
                if g.values.size.toLong * ys.size >= t }
            yield (g.key, g.values.size)
        }
        val e7 = xsSeq.groupBy(_ % m).toSeq.collect {
          case (k, vs) if vs.size.toLong * ysSeq.size >= t => (k, vs.size)
        }
        r7.collect().sorted shouldBe e7.sorted

        // UnnestGenerator: dependent nested-comprehension generator
        // (plain binder) with a guard on the binder and downstream reuse
        val r8 = onSpark {
          for {
            x <- xs
            v <- (for { y <- ys; if y % m == x % m } yield y * 10L + x)
            if v % 3 != t
          } yield (x, v, v + x)
        }
        val e8 = for {
          x <- xsSeq
          v <- (for { y <- ysSeq; if y % m == x % m } yield y * 10L + x)
          if v % 3 != t
        } yield (x, v, v + x)
        r8.collect().sorted shouldBe e8.sorted

        // UnnestGenerator: pattern binder over a tuple inner yield, with
        // a multi-generator inner chain (its own join inside)
        val r9 = onSpark {
          for {
            x <- xs
            (a, b) <- (for { y <- ys; if y % m == x % m; z <- zs; if z % 4 == y % 4 }
              yield (y, z * 2L))
            if b >= t
          } yield (x, a, b)
        }
        val e9 = for {
          x <- xsSeq
          (a, b) <- (for { y <- ysSeq; if y % m == x % m; z <- zsSeq; if z % 4 == y % 4 }
            yield (y, z * 2L))
          if b >= t
        } yield (x, a, b)
        r9.collect().sorted shouldBe e9.sorted

        // composite-key join: several equality guards tuple into ONE key
        val r10 = onSpark {
          for { x <- xs; y <- ys; if x % m == y % m; if y % 4 == x % 4
                if x + y >= t } yield (x, y)
        }
        val e10 = for { x <- xsSeq; y <- ysSeq; if x % m == y % m
          if y % 4 == x % 4; if x + y >= t } yield (x, y)
        r10.collect().sorted shouldBe e10.sorted

        // case-class unnest: the nested binder destructures a case-class
        // inner yield; components substitute positionally
        val r11 = onSpark {
          for {
            x <- xs
            PayRow(ok, cents) <- (for { y <- ys; if y % m == x % m }
              yield PayRow(y, y * t))
            if cents % 2 == 0L
          } yield (x, ok, cents)
        }
        val e11 = for {
          x <- xsSeq
          PayRow(ok, cents) <- (for { y <- ysSeq; if y % m == x % m }
            yield PayRow(y, y * t))
          if cents % 2 == 0L
        } yield (x, ok, cents)
        r11.collect().sorted shouldBe e11.sorted

        // DEPTH-3 unnest: the inner chain's own generator is itself a
        // dependent comprehension chain — the splice recurses per level
        // (r10 shape; ref Normalize runs to fixpoint)
        val r12 = onSpark {
          for {
            x <- xs
            v <- (for {
              y <- ys
              if y % m == x % m
              w <- (for { z <- zs; if z % 4 == y % 4 } yield z + y)
            } yield w + x)
          } yield (x, v)
        }
        val e12 = for {
          x <- xsSeq
          y <- ysSeq; if y % m == x % m
          z <- zsSeq; if z % 4 == y % 4
        } yield (x, (z + y) + x)
        r12.collect().sorted shouldBe e12.sorted

        // BLOCK spelling: two derived comprehensions assembled by vals and
        // unioned — the deep default-case pass re-expands each statement
        val r13 = onSpark {
          val a = for { x <- xs; y <- ys; if x % m == y % m } yield x + y
          val b = for { x <- xs; z <- zs; if z % 4 == x % 4 } yield x * z
          a union b
        }
        val e13 = (for { x <- xsSeq; y <- ysSeq; if x % m == y % m } yield x + y) ++
          (for { x <- xsSeq; z <- zsSeq; if z % 4 == x % 4 } yield x * z)
        r13.collect().sorted shouldBe e13.sorted

        // HELPER-DEF spelling (r11 shape; ref Lib.expand): the dependent bag
        // is built by a same-object def — beta-reduced in place, then the
        // depth-2 chain derives exactly like r12's written-out spelling
        def fuzzHelper(x: Long): DataBag[Long] =
          for { y <- ys; if y % m == x % m } yield y + x
        val r14 = onSpark {
          for { x <- xs; v <- fuzzHelper(x) } yield (x, v)
        }
        val e14 = for { x <- xsSeq; y <- ysSeq; if y % m == x % m }
          yield (x, y + x)
        r14.collect().sorted shouldBe e14.sorted

        // CROSS-FILE @lib spelling (r12 shape; ref Lib.expand consumes
        // @emma.lib defs from any file): the dependent bag is built by
        // CrossFileLibX.matchingAbove — parsed from its pickled source,
        // re-qualified, and inlined RECURSIVELY (it calls sibling
        // `matching`) — with the fuzz-varied threshold `t` substituting
        // as a beta-reduced argument
        val xpSeq = xsSeq.map(v => (v, v % m))
        val ypSeq = ysSeq.map(v => (v, v % m))
        val xp = DataBag(xpSeq); val yp = DataBag(ypSeq)
        val r15 = onSpark {
          for { x <- xp; y <- CrossFileLibX.matchingAbove(x, t, yp) }
            yield (x._1, y._1)
        }
        val e15 = for { x <- xpSeq; y <- ypSeq; if y._2 == x._2; if y._1 > t }
          yield (x._1, y._1)
        r15.collect().sorted shouldBe e15.sorted

        // GENERIC cross-file @lib spelling (r13 shape; ref Lib.expand
        // inlines type-parameterized defs, emma-lib kfold.split[A: Meta]):
        // matchingGen[A] monomorphizes from the typed call's inferred
        // A = Long and derives the same equi join, with the fuzz-varied
        // modulus key `x._2` substituting as a beta-reduced argument
        val r16 = onSpark {
          for { x <- xp; y <- CrossFileLibX.matchingGen(x._2, yp) }
            yield (x._1, y._1)
        }
        val e16 = for { x <- xpSeq; y <- ypSeq; if y._1 == x._2 }
          yield (x._1, y._1)
        r16.collect().sorted shouldBe e16.sorted

        // SCALAR @lib spelling (r14 shape; ref Lib.expand inlines scalar
        // bag consumers — stat.scala:27-39): meanL splices into the guard
        // and its folds hoist (uncorrelated scalar subquery); sumL over a
        // keyed sub-bag splices in the head and derives the correlated
        // pre-aggregate + join, with the fuzz-varied modulus in the key
        val r17 = onSpark {
          for { x <- xs; if x > graft.lib.dstat.meanL(zs) }
            yield (x, graft.lib.dstat.sumL(ys.withFilter(y => y % m == x % m)))
        }
        // zs is never empty by construction (draw(10 + …) above), and
        // dstat.meanL's documented contract REQUIRES a non-empty bag
        // (ArithmeticException at the hoisted driver fold otherwise —
        // QuotedStats scaladoc, ADVICE r14): the oracle divides directly,
        // so an empty bag would fail BOTH sides instead of diverging
        val zMu = zsSeq.sum / zsSeq.size
        val e17 = for { x <- xsSeq; if x > zMu }
          yield (x, ysSeq.filter(y => y % m == x % m).sum)
        r17.collect().sorted shouldBe e17.sorted

        // GUARD-localized ctor nesting (r14 shape; ref Normalize treats
        // every position alike): the guard folds a per-row literal bag
        // with the fuzz-varied threshold; the head nests depth-2
        val r18 = onSpark {
          for { x <- xs; if (for { w <- DataBag(0L to (x % 4)) } yield w).size > t % 3 }
            yield (x, (for { w <- DataBag(1L to (x % 3 + 1)) }
              yield (for { u <- DataBag(1L to w) } yield u).sum).sum)
        }
        val e18 = for { x <- xsSeq; if (0L to (x % 4)).size > t % 3 }
          yield (x, (for { w <- 1L to (x % 3 + 1) }
            yield (1L to w).sum).sum)
        r18.collect().sorted shouldBe e18.sorted
      }
    }
  }
}
