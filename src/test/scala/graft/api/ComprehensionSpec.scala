package graft.api

import org.apache.spark.sql.SparkSession
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.api.comprehensions.onSpark

/** The macro front-end: the guarded two-generator comprehension must PLAN
  * as an equi-join (no cartesian, no per-element re-evaluation) and return
  * exactly what the explicit equiJoin returns; unmatched shapes must pass
  * through unchanged. */
case class TriEdge(src: Long, dst: Long)
/** Inner-yield row for the case-class unnest shape. */
case class PayRow(ok: Long, cents: Long)
/** Row class with a `var` field: reads through a generator binder are
  * per-element data, NOT deferred captures — must stay derivable. */
case class VarCell(var v: Long)

/** Effect counter for the argument duplicate-evaluation pin (statics are
  * shared across local-mode executor threads). */
object EffCount {
  val n = new java.util.concurrent.atomic.AtomicLong(0L)
  def tick(): Long = { n.incrementAndGet(); 0L }
}

class ComprehensionSpec extends AnyFlatSpec with Matchers {

  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def bagL(s: Seq[Long]): DataBag[Long] = DataBag(s)

  behavior of "comprehensions.onSpark"

  it should "rewrite the equi-guard comprehension to an equiJoin" in {
    val xs = bagL(1L to 50L)
    val ys = bagL(Seq(2L, 4L, 6L, 8L, 10L, 12L))
    val joined = onSpark {
      for { x <- xs; y <- ys; if x % 7 == y % 5 } yield (x, y, x + y)
    }
    val plan = joined.toDF.queryExecution.executedPlan.toString
    plan should not include regex("(?i)cartesian")
    plan should not include regex("(?i)BroadcastNestedLoop")
    val expect = xs.equiJoin(ys)(_ % 7, _ % 5).map(p => (p._1, p._2, p._1 + p._2))
    joined.collect().sorted shouldBe expect.collect().sorted
    // and against the plain Scala semantics of the comprehension
    val seqRef = for { x <- 1L to 50L; y <- Seq(2L, 4L, 6L, 8L, 10L, 12L); if x % 7 == y % 5 }
      yield (x, y, x + y)
    joined.collect().sorted shouldBe seqRef.sorted
  }

  it should "tuple MULTIPLE equality guards into one composite-key join" in {
    val xs = bagL(1L to 40L)
    val ys = bagL(1L to 40L)
    val r = onSpark {
      for { x <- xs; y <- ys; if x % 7 == y % 7; if y % 5 == x % 5; if x + y > 10L }
        yield (x, y)
    }
    val plan = r.toDF.queryExecution.executedPlan.toString
    plan should not include regex("(?i)cartesian")
    plan should not include regex("(?i)BroadcastNestedLoop")
    // ONE join keyed on BOTH equalities — the second must not demote to a
    // post filter over a partial-key join
    val joins = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)".r
      .findAllIn(plan).length
    joins shouldBe 1
    val seqRef = for { x <- 1L to 40L; y <- 1L to 40L
      if x % 7 == y % 7; if y % 5 == x % 5; if x + y > 10L } yield (x, y)
    r.collect().sorted shouldBe seqRef.sorted
    // spelled as one && conjunction: same derivation
    val r2 = onSpark {
      for { x <- xs; y <- ys; if x % 7 == y % 7 && y % 5 == x % 5 } yield (x, y)
    }
    val seqRef2 = for { x <- 1L to 40L; y <- 1L to 40L
      if x % 7 == y % 7 && y % 5 == x % 5 } yield (x, y)
    r2.collect().sorted shouldBe seqRef2.sorted
  }

  it should "rewrite when the guard sides are swapped" in {
    val xs = bagL(1L to 20L)
    val ys = bagL(1L to 20L)
    val joined = onSpark {
      for { x <- xs; y <- ys; if y % 3 == x % 4 } yield x * 100 + y
    }
    val plan = joined.toDF.queryExecution.executedPlan.toString
    plan should not include regex("(?i)cartesian")
    val seqRef = for { x <- 1L to 20L; y <- 1L to 20L; if y % 3 == x % 4 }
      yield x * 100 + y
    joined.collect().sorted shouldBe seqRef.sorted
  }

  it should "rewrite the unguarded two-generator shape to a cross" in {
    val xs = bagL(1L to 5L)
    val ys = bagL(10L to 12L)
    val crossed = onSpark { for { x <- xs; y <- ys } yield x * 100 + y }
    val seqRef = for { x <- 1L to 5L; y <- 10L to 12L } yield x * 100 + y
    crossed.collect().sorted shouldBe seqRef.sorted
  }

  it should "leave inseparable guards semantically intact" in {
    val xs = bagL(1L to 10L)
    val ys = bagL(1L to 10L)
    // x + y on one side — cannot split into key functions; falls through
    val kept = onSpark {
      for { x <- xs; y <- ys; if x + y == 7L } yield (x, y)
    }
    val seqRef = for { x <- 1L to 10L; y <- 1L to 10L; if x + y == 7L } yield (x, y)
    kept.collect().sorted shouldBe seqRef.sorted
  }

  it should "derive a 3-generator chain as two joins (triangle shape)" in {
    val edges = Seq(
      TriEdge(1, 2), TriEdge(2, 3), TriEdge(3, 1), TriEdge(2, 4),
      TriEdge(4, 1), TriEdge(1, 3), TriEdge(3, 4)
    )
    val es = DataBag(edges)
    val tri = onSpark {
      for {
        a <- es
        b <- es
        if a.dst == b.src
        cc <- es
        if b.dst == cc.src
        if cc.dst == a.src
      } yield (a.src, b.src, cc.src)
    }
    val plan = tri.toDF.queryExecution.executedPlan.toString
    plan should not include regex("(?i)cartesian")
    plan should not include regex("(?i)BroadcastNestedLoop")
    val seqRef = for {
      a <- edges; b <- edges; if a.dst == b.src
      cc <- edges; if b.dst == cc.src; if cc.dst == a.src
    } yield (a.src, b.src, cc.src)
    tri.collect().sorted shouldBe seqRef.sorted
  }

  it should "pre-filter per-generator guards on the generator's own bag" in {
    val xs = bagL(1L to 30L)
    val ys = bagL(1L to 30L)
    val r = onSpark {
      for {
        x <- xs
        if x % 2 == 0L
        y <- ys
        if y % 3 == 0L
        if x % 5 == y % 5
      } yield (x, y)
    }
    val seqRef = for {
      x <- 1L to 30L; if x % 2 == 0L
      y <- 1L to 30L; if y % 3 == 0L; if x % 5 == y % 5
    } yield (x, y)
    r.collect().sorted shouldBe seqRef.sorted
    val plan = r.toDF.queryExecution.executedPlan.toString
    plan should not include regex("(?i)cartesian")
  }

  it should "derive a 4-generator chain with a guard reaching back two levels" in {
    val as = bagL(1L to 12L)
    val bs = bagL(1L to 12L)
    val cs = bagL(1L to 12L)
    val ds = bagL(1L to 12L)
    val r = onSpark {
      for {
        a <- as
        b <- bs
        if a % 3 == b % 3
        cc <- cs
        if b % 4 == cc % 4
        dd <- ds
        if a % 5 == dd % 5
        if cc < dd
      } yield (a, b, cc, dd)
    }
    val seqRef = for {
      a <- 1L to 12L; b <- 1L to 12L; if a % 3 == b % 3
      cc <- 1L to 12L; if b % 4 == cc % 4
      dd <- 1L to 12L; if a % 5 == dd % 5; if cc < dd
    } yield (a, b, cc, dd)
    r.collect().sorted shouldBe seqRef.sorted
    val plan = r.toDF.queryExecution.executedPlan.toString
    plan should not include regex("(?i)cartesian")
    plan should not include regex("(?i)BroadcastNestedLoop")
  }

  it should "derive joins for pattern-tuple generators" in {
    val ps = DataBag(Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "a")))
    val qs = DataBag(Seq(("a", 10L), ("b", 20L), ("z", 30L), ("a", 40L)))
    val joined = onSpark {
      for { (id, tag) <- ps; (tag2, w) <- qs; if tag == tag2 } yield (id, w)
    }
    val plan = joined.toDF.queryExecution.executedPlan.toString
    plan should not include regex("(?i)cartesian")
    plan should not include regex("(?i)BroadcastNestedLoop")
    val seqRef = for {
      (id, tag) <- Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "a"))
      (tag2, w) <- Seq(("a", 10L), ("b", 20L), ("z", 30L), ("a", 40L))
      if tag == tag2
    } yield (id, w)
    joined.collect().sorted shouldBe seqRef.sorted
  }

  it should "mix pattern and plain generators with own and post guards" in {
    val ps = DataBag(Seq((1L, 5L), (2L, 6L), (3L, 7L), (4L, 8L)))
    val ys = bagL(1L to 20L)
    val r = onSpark {
      for {
        (id, v) <- ps
        y <- ys
        if y % 2 == 0L
        if v % 3 == y % 3
        if id < y
      } yield (id, v, y)
    }
    val plan = r.toDF.queryExecution.executedPlan.toString
    plan should not include regex("(?i)cartesian")
    val seqRef = for {
      (id, v) <- Seq((1L, 5L), (2L, 6L), (3L, 7L), (4L, 8L))
      y <- 1L to 20L
      if y % 2 == 0L; if v % 3 == y % 3; if id < y
    } yield (id, v, y)
    r.collect().sorted shouldBe seqRef.sorted
  }

  it should "derive joins through a val binding in the comprehension" in {
    // `k = f(x)` desugars to a map introducing a tuple pattern level —
    // covered by the pattern-generator support
    val xs = bagL(1L to 50L)
    val ys = bagL(Seq(2L, 4L, 6L, 8L, 10L, 12L))
    val joined = onSpark {
      for { x <- xs; k = x % 7; y <- ys; if k == y % 5 } yield (x, y)
    }
    val plan = joined.toDF.queryExecution.executedPlan.toString
    plan should not include regex("(?i)cartesian")
    plan should not include regex("(?i)BroadcastNestedLoop")
    val seqRef = for { x <- 1L to 50L; k = x % 7; y <- Seq(2L, 4L, 6L, 8L, 10L, 12L); if k == y % 5 }
      yield (x, y)
    joined.collect().sorted shouldBe seqRef.sorted
  }

  it should "derive joins for case-class patterns (reference triangle style)" in {
    val edges = Seq(TriEdge(1, 2), TriEdge(2, 3), TriEdge(3, 1), TriEdge(2, 4))
    val es = DataBag(edges)
    val r = onSpark {
      for { TriEdge(s1, d1) <- es; TriEdge(s2, d2) <- es; if d1 == s2 } yield (s1, d2)
    }
    val plan = r.toDF.queryExecution.executedPlan.toString
    plan should not include regex("(?i)cartesian")
    val seqRef = for { TriEdge(s1, d1) <- edges; TriEdge(s2, d2) <- edges; if d1 == s2 }
      yield (s1, d2)
    r.collect().sorted shouldBe seqRef.sorted
  }

  it should "extract the join key from a && conjunction guard" in {
    val xs = bagL(1L to 50L)
    val ys = bagL(Seq(2L, 4L, 6L, 8L, 10L, 12L))
    val joined = onSpark {
      for { x <- xs; y <- ys; if x % 7 == y % 5 && y > 2L && x < 40L } yield (x, y)
    }
    val plan = joined.toDF.queryExecution.executedPlan.toString
    plan should not include regex("(?i)cartesian")
    plan should not include regex("(?i)BroadcastNestedLoop")
    val seqRef = for {
      x <- 1L to 50L; y <- Seq(2L, 4L, 6L, 8L, 10L, 12L)
      if x % 7 == y % 5 && y > 2L && x < 40L
    } yield (x, y)
    joined.collect().sorted shouldBe seqRef.sorted
  }

  it should "derive the join from the dependent-FILTER spelling" in {
    // the MatchFlatMap2-lite shape: the join condition is a withFilter on
    // the inner generator closing over the outer row — FilterChain peels
    // it into a guard, so the same equi-join is derived
    val xs = bagL(1L to 50L)
    val ys = bagL(Seq(2L, 4L, 6L, 8L, 10L, 12L))
    val joined = onSpark {
      for { x <- xs; y <- ys.withFilter(y => x % 7 == y % 5) } yield (x, y)
    }
    val plan = joined.toDF.queryExecution.executedPlan.toString
    plan should not include regex("(?i)cartesian")
    plan should not include regex("(?i)BroadcastNestedLoop")
    val seqRef = for { x <- 1L to 50L; y <- Seq(2L, 4L, 6L, 8L, 10L, 12L); if x % 7 == y % 5 }
      yield (x, y)
    joined.collect().sorted shouldBe seqRef.sorted
  }

  it should "keep the join key when a guard-local lambda shadows a generator name" in {
    // name-based analysis would see the shadowing `x` and demote the key
    // to a post filter (typed filter over a cross — a nested-loop plan);
    // symbol identity on the typed tree must keep the equi-join
    val xs = bagL(1L to 50L)
    val ys = bagL(Seq(2L, 4L, 6L, 8L, 10L, 12L))
    val joined = onSpark {
      for { x <- xs; y <- ys; if x % 7 == Seq(y).map(x => x % 5).head } yield (x, y)
    }
    val plan = joined.toDF.queryExecution.executedPlan.toString
    plan should not include regex("(?i)cartesian")
    plan should not include regex("(?i)BroadcastNestedLoop")
    val seqRef = for { x <- 1L to 50L; y <- Seq(2L, 4L, 6L, 8L, 10L, 12L); if x % 7 == y % 5 }
      yield (x, y)
    joined.collect().sorted shouldBe seqRef.sorted
  }

  it should "pass comprehensions over local later generators through unchanged" in {
    // these typecheck against the IterableOnce flatMap overload and run
    // correctly as written; the macro must not hard-error on them
    val xs = bagL(1L to 5L)
    val r = onSpark { for { x <- xs; y <- Seq(10L, 20L) } yield x * 100 + y }
    r.collect().sorted shouldBe
      (for { x <- 1L to 5L; y <- Seq(10L, 20L) } yield x * 100 + y).sorted
  }

  it should "reject a tail mixing DataBag and local generators at compile time" in {
    // passing this through would hit DataBag.flatMap's distributed-inner
    // overload and throw at runtime — the macro must refuse it up front
    """
    val xs = bagL(1L to 5L)
    val ys = bagL(1L to 5L)
    onSpark { for { x <- xs; y <- ys; z <- Seq(10L, 20L) } yield (x, y, z) }
    """ shouldNot compile
  }

  it should "derive a dependent LOCAL DataBag generator as a flatMap (MatchFlatMap1)" in {
    val xs = bagL(1L to 10L)
    val out = onSpark {
      for { x <- xs; y <- DataBag(Seq(x, x * 10)); if y % 2 == 0 } yield (x, y)
    }
    val seqRef = for { x <- 1L to 10L; y <- Seq(x, x * 10); if y % 2 == 0 } yield (x, y)
    out.collect().sorted shouldBe seqRef.sorted
  }

  it should "still derive a join AFTER a dependent local generator" in {
    val xs = bagL(1L to 6L)
    val zs = bagL(1L to 100L)
    val out = onSpark {
      for { x <- xs; y <- DataBag(Seq(x, x + 1)); z <- zs; if z % 10 == y }
        yield (x, y, z)
    }
    val plan = out.toDF.queryExecution.executedPlan.toString
    plan should not include regex("(?i)cartesian")
    val seqRef = for { x <- 1L to 6L; y <- Seq(x, x + 1); z <- 1L to 100L; if z % 10 == y }
      yield (x, y, z)
    out.collect().sorted shouldBe seqRef.sorted
  }

  it should "reject dependent DISTRIBUTED generators at compile time" in {
    """
    val xs = bagL(1L to 5L)
    val ys = bagL(1L to 5L)
    val zs = bagL(6L to 9L)
    onSpark { for { x <- xs; y <- (if (x > 2L) ys else zs) } yield x + y }
    """ shouldNot compile
  }

  it should "localize a nested head comprehension over a literal DataBag(seq)" in {
    // one level of head nesting (the reference's UnnestGenerator shape):
    // the inner comprehension ranges over a per-element literal bag and is
    // folded in the yield — it must run locally inside the map closure,
    // with Seq-identical semantics
    val xs = bagL(1L to 10L)
    val ys = bagL(Seq(2L, 4L, 6L))
    val out = onSpark {
      for { x <- xs; y <- ys; if x % 3 == y % 5 }
        yield (x, y, (for { w <- DataBag(1L to x) } yield w * y).sum)
    }
    val seqRef = for { x <- 1L to 10L; y <- Seq(2L, 4L, 6L); if x % 3 == y % 5 }
      yield (x, y, (for { w <- 1L to x } yield w * y).sum)
    out.collect().sorted shouldBe seqRef.sorted
    // and the outer chain still plans the equi-join
    val plan = out.toDF.queryExecution.executedPlan.toString
    plan should not include regex("(?i)cartesian")
  }

  it should "localize a nested head over a SINGLE generator (guards kept)" in {
    val xs = bagL(1L to 8L)
    val out = onSpark {
      for { x <- xs; if x % 2 == 0 }
        yield (x, (for { w <- DataBag(Seq(x, x + 1)); if w % 2 == 1 } yield w).size)
    }
    val seqRef = for { x <- 1L to 8L; if x % 2 == 0 }
      yield (x, (for { w <- Seq(x, x + 1); if w % 2 == 1 } yield w).size.toLong)
    out.collect().sorted shouldBe seqRef.sorted
  }

  it should "localize DEPTH-2 head nesting (inner yield nests another ctor comprehension)" in {
    // r14: the reference's Normalize fixpoint shape — the nested head
    // comprehension's own yield comprehends over another literal ctor;
    // the localizer recurses, so the whole nest runs inside the closure
    val xs = bagL(1L to 6L)
    val out = onSpark {
      for { x <- xs; if x % 2 == 0 }
        yield (x, (for { w <- DataBag(1L to x) }
          yield (for { u <- DataBag(1L to w) } yield u * 2).sum).sum)
    }
    val seqRef = for { x <- 1L to 6L; if x % 2 == 0 }
      yield (x, (for { w <- 1L to x }
        yield (for { u <- 1L to w } yield u * 2).sum).sum)
    out.collect().sorted shouldBe seqRef.sorted
  }

  it should "localize a GUARD-position nested ctor comprehension fold (r14)" in {
    // guards comprehending over literal ctors used to abort; they now
    // localize exactly like the yield (Normalize treats positions alike)
    val xs = bagL(1L to 8L)
    val out = onSpark {
      for { x <- xs; if (for { w <- DataBag(1L to x) } yield w).sum > 6L }
        yield x
    }
    out.collect().sorted shouldBe (1L to 8L).filter(x => (1L to x).sum > 6L).sorted
  }

  it should "localize a dependent-ctor EXISTS guard (not semi-joinable: the bag is per-row)" in {
    val xs = bagL(1L to 9L)
    val out = onSpark {
      for { x <- xs; if DataBag(Seq(x, x + 1L)).exists(w => w % 3 == 0) } yield x
    }
    out.collect().sorted shouldBe
      (1L to 9L).filter(x => Seq(x, x + 1L).exists(w => w % 3 == 0)).sorted
  }

  it should "localize guard-position ctor folds at level >= 2 of a multi-generator chain" in {
    val xs = bagL(1L to 6L)
    val ys = bagL(1L to 6L)
    val out = onSpark {
      for { x <- xs; y <- ys; if x % 3 == y % 3
            if (for { w <- DataBag(1L to (x + y)) } yield w).size > 7L }
        yield (x, y)
    }
    val seqRef = for { x <- 1L to 6L; y <- 1L to 6L; if x % 3 == y % 3
        if (1L to (x + y)).size > 7 } yield (x, y)
    out.collect().sorted shouldBe seqRef.sorted
    // the equi join is still planned (localization must not demote it)
    val plan = out.toDF.queryExecution.executedPlan.toString
    plan should not include regex("(?i)cartesian")
  }

  it should "still abort a guard that references a DISTRIBUTED bag beside a ctor" in {
    // the inequality-correlated fold is underivable AND unhoistable, so
    // the distributed reference must keep aborting even though the ctor
    // half of the guard is localizable
    """
    val xs = bagL(1L to 5L)
    val ys = bagL(1L to 5L)
    onSpark {
      for { x <- xs
            if (for { w <- DataBag(1L to x) } yield w).sum >
              ys.withFilter(y => y < x).size }
        yield x
    }
    """ shouldNot compile
  }

  it should "localize a nested head written through a RENAMED DataBag import" in {
    // the typed tree proves ctor-ness by SYMBOL but the untyped rewriter
    // matches by NAME — a renamed companion import must still be rewritten
    // (previously it compiled unrewritten and crashed on executors)
    import graft.api.{DataBag => DB}
    val xs = bagL(1L to 6L)
    val out = onSpark {
      for { x <- xs; if x % 2 == 0 }
        yield (x, (for { w <- DB(1L to x) } yield w * 2).sum)
    }
    val seqRef = for { x <- 1L to 6L; if x % 2 == 0 }
      yield (x, (for { w <- 1L to x } yield w * 2).sum)
    out.collect().sorted shouldBe seqRef.sorted
  }

  it should "derive a semi join from an EXISTS guard (single generator)" in {
    val xs = bagL(1L to 30L)
    val ys = bagL(Seq(2L, 4L, 6L))
    val r = onSpark { for { x <- xs; if ys.exists(y => y == x % 7) } yield x }
    val plan = r.toDF.queryExecution.executedPlan.toString
    plan should include("LeftSemi")
    val seqRef = for { x <- 1L to 30L; if Seq(2L, 4L, 6L).exists(y => y == x % 7) }
      yield x
    r.collect().sorted shouldBe seqRef.sorted
  }

  it should "derive an anti join from a NOT-EXISTS guard and from forall(!=)" in {
    val xs = bagL(1L to 30L)
    val ys = bagL(Seq(2L, 4L, 6L))
    val notExists = onSpark {
      for { x <- xs; if !ys.exists(y => y == x % 7) } yield x
    }
    notExists.toDF.queryExecution.executedPlan.toString should include("LeftAnti")
    val seqRef = for { x <- 1L to 30L; if !Seq(2L, 4L, 6L).exists(y => y == x % 7) }
      yield x
    notExists.collect().sorted shouldBe seqRef.sorted
    // forall over an inequality is the same anti join...
    val viaForall = onSpark {
      for { x <- xs; if ys.forall(y => y != x % 7) } yield x
    }
    viaForall.toDF.queryExecution.executedPlan.toString should include("LeftAnti")
    viaForall.collect().sorted shouldBe seqRef.sorted
    // ...and its negation is the semi join
    val negForall = onSpark {
      for { x <- xs; if !ys.forall(y => y != x % 7) } yield x
    }
    negForall.toDF.queryExecution.executedPlan.toString should include("LeftSemi")
    negForall.collect().sorted shouldBe ((1L to 30L).toSeq diff seqRef).sorted
  }

  it should "derive semi/anti joins from the withFilter emptiness spellings" in {
    val xs = bagL(1L to 30L)
    val ys = bagL(Seq(2L, 4L, 6L))
    // withFilter(f).nonEmpty IS exists(f)
    val nonE = onSpark {
      for { x <- xs; if ys.withFilter(y => y == x % 7).nonEmpty } yield x
    }
    nonE.toDF.queryExecution.executedPlan.toString should include("LeftSemi")
    val seqRef = for { x <- 1L to 30L
      if Seq(2L, 4L, 6L).exists(y => y == x % 7) } yield x
    nonE.collect().sorted shouldBe seqRef.sorted
    // .isEmpty is the negation; inner-only conjunct still pre-filters
    val isE = onSpark {
      for { x <- xs; if ys.withFilter(y => y == x % 7 && y > 2L).isEmpty } yield x
    }
    isE.toDF.queryExecution.executedPlan.toString should include("LeftAnti")
    val seqRef2 = for { x <- 1L to 30L
      if !Seq(2L, 4L, 6L).exists(y => y == x % 7 && y > 2L) } yield x
    isE.collect().sorted shouldBe seqRef2.sorted
    // an outer ! flips the emptiness spelling too
    val negNonE = onSpark {
      for { x <- xs; if !ys.withFilter(y => y == x % 7).nonEmpty } yield x
    }
    negNonE.toDF.queryExecution.executedPlan.toString should include("LeftAnti")
    negNonE.collect().sorted shouldBe ((1L to 30L).toSeq diff seqRef).sorted
  }

  it should "hoist uncorrelated global folds into driver vals (scalar subqueries)" in {
    val xs = bagL(1L to 30L)
    val ys = bagL(Seq(2L, 4L, 6L))
    // folds in a guard: sum and size hoist, the guard becomes a plain
    // filter on the hoisted values (here: x > (4+8+12)/3 = 8)
    val guarded = onSpark {
      for { x <- xs; if x > ys.map(_ * 2L).sum / ys.size } yield x
    }
    guarded.collect().sorted shouldBe (9L to 30L)
    // a fold in the yield
    val inHead = onSpark { for { x <- xs; if x <= 3L } yield x * ys.size }
    inHead.collect().sorted shouldBe Seq(3L, 6L, 9L)
    // min/max hoist (no empty-group default needed on the driver)
    val belowMax = onSpark { for { x <- xs; if x < ys.min || x > ys.max * 4L } yield x }
    belowMax.collect().sorted shouldBe (Seq(1L) ++ (25L to 30L))
    // an uncorrelated quantifier next to a derived equi join
    val zs = bagL(Seq(100L))
    val joined = onSpark {
      for { x <- xs; y <- ys; if x % 7 == y % 5; if zs.exists(_ > 50L) }
        yield (x, y)
    }
    val plan = joined.toDF.queryExecution.executedPlan.toString
    plan should not include regex("(?i)cartesian")
    val seqRef = for { x <- 1L to 30L; y <- Seq(2L, 4L, 6L); if x % 7 == y % 5 }
      yield (x, y)
    joined.collect().sorted shouldBe seqRef.sorted
    val emptied = onSpark {
      for { x <- xs; y <- ys; if x % 7 == y % 5; if zs.exists(_ > 500L) }
        yield (x, y)
    }
    emptied.collect() shouldBe empty
  }

  it should "compose hoisted globals with correlated fold guards" in {
    val xs = bagL(1L to 20L)
    val ys = bagL(1L to 12L)
    // correlated count (pre-aggregate + join) compared against a hoisted
    // global: ys.size / 6 = 2, count(y == x % 7) is 2 for x % 7 in 1..5
    val res = onSpark {
      for { x <- xs; if ys.count(y => y % 6L == x % 7L) >= ys.size / 6L } yield x
    }
    val seqRef = for { x <- 1L to 20L
      if (1L to 12L).count(y => y % 6L == x % 7L) >= 2 } yield x
    res.collect().sorted shouldBe seqRef.sorted
    // uncorrelated collect() now HOISTS too (a driver val holding the
    // Seq), so Seq ops over it in a guard are plain local code
    val viaCollect = onSpark {
      for { x <- xs; if ys.collect().length > x } yield x
    }
    viaCollect.collect().sorted shouldBe (1L to 20L).filter(_ < 12L).sorted
    // a fold whose RECEIVER depends on the generator cannot hoist and
    // still aborts (the bag would ride the executor closure)
    """
    val xs = bagL(1L to 5L)
    val ys = bagL(1L to 5L)
    onSpark { for { x <- xs; if (if (x > 2L) ys else xs).size > x } yield x }
    """ shouldNot compile
  }

  it should "derive correlated min/max folds via pre-aggregate + join (throwing on empty groups)" in {
    val xs = bagL(1L to 6L)
    val ys = bagL(1L to 40L)
    // every x % 3 group of ys is non-empty: values must equal the
    // sequential semantics exactly (bare max + mapped min)
    val res = onSpark {
      for { x <- xs } yield (x,
        ys.withFilter(y => y % 3L == x % 3L).max,
        ys.withFilter(y => y % 3L == x % 3L).map(y => y * 2L).min)
    }
    val seqRef = for { x <- 1L to 6L } yield (x,
      (1L to 40L).filter(y => y % 3L == x % 3L).max,
      (1L to 40L).filter(y => y % 3L == x % 3L).map(y => y * 2L).min)
    res.collect().sorted shouldBe seqRef.sorted
    // the plan pre-aggregates: no per-row jobs, a single collect works
    // on a guard too (the correlated-HAVING shape with max)
    val guarded = onSpark {
      for { x <- xs; if ys.withFilter(y => y % 3L == x % 3L).max >= 39L } yield x
    }
    val seqG = for { x <- 1L to 6L
      if (1L to 40L).filter(y => y % 3L == x % 3L).max >= 39L } yield x
    guarded.collect().sorted shouldBe seqG.sorted
    // an EMPTY group throws — the sequential `min of empty bag` semantics
    // (wrapped in Spark's task-failure chain)
    val zs = bagL(Seq(2L, 4L))
    val crashing = onSpark {
      for { x <- bagL(Seq(1L, 3L)) } yield (x, zs.withFilter(z => z == x).min)
    }
    val thrown = intercept[Throwable] { crashing.collect() }
    Iterator.iterate(thrown)(_.getCause).takeWhile(_ != null).take(8)
      .exists(_.isInstanceOf[NoSuchElementException]) shouldBe true
  }

  it should "derive correlated collect() heads as grouped lists + outer join" in {
    // the NESTED-RESULT shape (SQL's correlated ARRAY subquery; the
    // reference reaches it by comprehension nesting + fold fusion):
    // `ys.withFilter(key)[.map(v)].collect()` pre-groups the inner bag by
    // its key, outer-joins with Nil default; the List's order is
    // UNSPECIFIED (the DataBag.collect contract) so deterministic
    // consumers sort locally — which stays plain local code over the
    // substituted value
    val xs = bagL(1L to 10L)
    val ys = bagL(1L to 40L)
    val r = onSpark {
      for { x <- xs } yield
        (x, ys.withFilter(y => y % 12 == x).map(y => y * 2L).collect()
          .sorted.mkString(","))
    }
    val seqRef = for { x <- 1L to 10L } yield
      (x, (1L to 40L).filter(y => y % 12 == x).map(_ * 2L).sorted.mkString(","))
    r.collect().sorted shouldBe seqRef.sorted
    // the empty group yields Nil -> "" (x = 12.. never matches y % 12)
    seqRef.exists(_._2.isEmpty) shouldBe false
    val rEmpty = onSpark {
      for { x <- bagL(11L to 13L) } yield
        (x, ys.withFilter(y => y % 50 == x).collect().sorted.mkString(","))
    }
    rEmpty.collect().sorted shouldBe (11L to 13L).map(x =>
      (x, (1L to 40L).filter(y => y % 50 == x).sorted.mkString(","))).sorted
    // the nested-comprehension spelling lowers identically
    val rNested = onSpark {
      for { x <- xs } yield
        (x, (for { y <- ys; if y % 12 == x } yield y + 1L).collect().sorted.sum)
    }
    rNested.collect().sorted shouldBe (for { x <- 1L to 10L } yield
      (x, (1L to 40L).filter(y => y % 12 == x).map(_ + 1L).sum)).sorted
    // an UNCORRELATED collect hoists into a driver val
    val rGlobal = onSpark {
      for { x <- bagL(1L to 5L) } yield (x, ys.collect().sorted.take(3).sum)
    }
    rGlobal.collect().sorted shouldBe (for { x <- 1L to 5L } yield
      (x, (1L to 40L).sorted.take(3).sum)).sorted
    // non-equality correlation still rejects at compile time
    """
    val xs = bagL(1L to 5L)
    val ys = bagL(1L to 5L)
    onSpark { for { x <- xs } yield (x, ys.withFilter(y => y > x).collect()) }
    """ shouldNot compile
  }

  it should "derive HEAD-position exists as count > 0 (SELECT-list EXISTS)" in {
    // `yield (x, ys.exists(y => key && p))` — SQL's EXISTS in the select
    // list — pre-aggregates a count under the same classification as
    // count(p); a missing group joins the zero default, i.e. false
    val xs = bagL(1L to 20L)
    val ys = bagL(Seq(2L, 4L, 4L, 6L, 9L))
    val r = onSpark {
      for { x <- xs } yield (x, ys.exists(y => y == x % 7 && y > 3L))
    }
    val ySeq = Seq(2L, 4L, 4L, 6L, 9L)
    val exp = for { x <- 1L to 20L } yield (x, ySeq.exists(y => y == x % 7 && y > 3L))
    r.collect().sorted shouldBe exp.sorted
    // guard-position exists keeps deriving the semi join
    val g = onSpark {
      for { x <- xs; if ys.exists(y => y == x % 7) } yield x
    }
    g.toDF.queryExecution.executedPlan.toString should include("LeftSemi")
    g.collect().sorted shouldBe (1L to 20L).filter(x => ySeq.contains(x % 7)).sorted
    // exists composed with other head folds in one yield
    val both = onSpark {
      for { x <- xs } yield
        (x, ys.exists(y => y == x % 7), ys.count(y => y == x % 7))
    }
    val expBoth = for { x <- 1L to 20L } yield
      (x, ySeq.exists(_ == x % 7), ySeq.count(_ == x % 7).toLong)
    both.collect().sorted shouldBe expBoth.sorted
    // non-equality exists in the head still rejects
    """
    val xs = bagL(1L to 5L)
    val ys = bagL(1L to 5L)
    onSpark { for { x <- xs } yield (x, ys.exists(y => y > x)) }
    """ shouldNot compile
  }

  it should "batch same-key correlated folds into ONE aggregation (fold-forest fusion)" in {
    val xs = bagL(1L to 6L)
    val ys = bagL(1L to 40L)
    val res = onSpark {
      for { x <- xs } yield (x,
        ys.withFilter(y => y % 3L == x % 3L).size,
        ys.withFilter(y => y % 3L == x % 3L).map(y => y * 2L).sum,
        ys.withFilter(y => y % 3L == x % 3L).min,
        ys.withFilter(y => y % 3L == x % 3L).max)
    }
    val seqRef = for { x <- 1L to 6L } yield {
      val g = (1L to 40L).filter(y => y % 3L == x % 3L)
      (x, g.size.toLong, g.map(_ * 2L).sum, g.min, g.max)
    }
    res.collect().sorted shouldBe seqRef.sorted
    // all four folds share one filtered root and key, so they must ride
    // ONE combinable aggregation: a single partial/final pair in the
    // final plan (AQE's string repeats nodes under "== Initial Plan ==")
    val plan = res.toDF.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    "ObjectHashAggregate".r.findAllIn(plan).size shouldBe 2
  }

  it should "pre-filter the EXISTS bag with inner-only conjuncts and tuple composite keys" in {
    val xs = bagL(1L to 40L)
    val ys = bagL(1L to 10L)
    // inner-only conjunct y > 2 pre-filters ys; the equality keys the semi
    val r = onSpark {
      for { x <- xs; if ys.exists(y => x % 7 == y && y > 2L) } yield x
    }
    val seqRef = for { x <- 1L to 40L; if (1L to 10L).exists(y => x % 7 == y && y > 2L) }
      yield x
    r.collect().sorted shouldBe seqRef.sorted
    // two separable equalities tuple into one composite key
    val pairs = DataBag((1L to 20L).map(i => (i % 5, i % 3)))
    val r2 = onSpark {
      for { x <- xs; if pairs.exists(p => p._1 == x % 5 && p._2 == x % 3) } yield x
    }
    val pairSeq = (1L to 20L).map(i => (i % 5, i % 3))
    val seqRef2 = for { x <- 1L to 40L
      if pairSeq.exists(p => p._1 == x % 5 && p._2 == x % 3) } yield x
    r2.toDF.queryExecution.executedPlan.toString should include("LeftSemi")
    r2.collect().sorted shouldBe seqRef2.sorted
  }

  it should "apply an EXISTS guard over the joined tuple in a multi-generator chain" in {
    val xs = bagL(1L to 12L)
    val ys = bagL(1L to 12L)
    val zs = bagL(Seq(4L, 7L, 10L, 22L))
    val r = onSpark {
      for { x <- xs; y <- ys; if x % 3 == y % 3; if zs.exists(z => z == x + y) }
        yield (x, y)
    }
    val plan = r.toDF.queryExecution.executedPlan.toString
    plan should include("LeftSemi")
    plan should not include regex("(?i)cartesian")
    val seqRef = for { x <- 1L to 12L; y <- 1L to 12L; if x % 3 == y % 3
      if Seq(4L, 7L, 10L, 22L).exists(z => z == x + y) } yield (x, y)
    r.collect().sorted shouldBe seqRef.sorted
    // level-1 exists BEFORE a derived equi join: semi joins the first bag
    val r2 = onSpark {
      for { x <- xs; if zs.exists(z => z == x * 2); y <- ys; if x % 4 == y % 4 }
        yield (x, y)
    }
    val seqRef2 = for { x <- 1L to 12L; if Seq(4L, 7L, 10L, 22L).exists(z => z == x * 2)
      y <- 1L to 12L; if x % 4 == y % 4 } yield (x, y)
    r2.collect().sorted shouldBe seqRef2.sorted
  }

  it should "derive a correlated count in the yield as pre-aggregate + left outer join" in {
    val xs = bagL(1L to 20L)
    val ys = bagL(Seq(1L, 2L, 2L, 3L, 3L, 3L))
    // the canonical correlated-count spelling: key inside the predicate;
    // outer rows with no match get 0 (the monoid zero via the outer join)
    val r = onSpark { for { x <- xs } yield (x, ys.count(y => y == x % 5)) }
    val yseq = Seq(1L, 2L, 2L, 3L, 3L, 3L)
    val seqRef = for { x <- 1L to 20L } yield (x, yseq.count(y => y == x % 5).toLong)
    r.collect().sorted shouldBe seqRef.sorted
    // an extra inner-only conjunct pre-filters the aggregated bag
    val r2 = onSpark { for { x <- xs } yield (x, ys.count(y => y == x % 5 && y > 1L)) }
    val seqRef2 = for { x <- 1L to 20L }
      yield (x, yseq.count(y => y == x % 5 && y > 1L).toLong)
    r2.collect().sorted shouldBe seqRef2.sorted
  }

  it should "derive a correlated nested-comprehension sum in the yield (FoldGroupFusion)" in {
    val xs = bagL(1L to 15L)
    val ys = bagL(1L to 30L)
    val r = onSpark {
      for { x <- xs }
        yield (x, (for { y <- ys; if y % 7 == x % 7; if y > 3L } yield y * 2L).sum)
    }
    val seqRef = for { x <- 1L to 15L }
      yield (x, (for { y <- 1L to 30L; if y % 7 == x % 7; if y > 3L } yield y * 2L).sum)
    r.collect().sorted shouldBe seqRef.sorted
    // .size spelling, and TWO independent folds in one yield
    val r2 = onSpark {
      for { x <- xs } yield (x,
        ys.withFilter(y => y % 7 == x % 7).size,
        ys.count(y => y == x + 1L))
    }
    val seqRef2 = for { x <- 1L to 15L } yield (x,
      (1L to 30L).count(y => y % 7 == x % 7).toLong,
      (1L to 30L).count(y => y == x + 1L).toLong)
    r2.collect().sorted shouldBe seqRef2.sorted
  }

  it should "derive head folds over the joined tuple in a multi-generator chain" in {
    val xs = bagL(1L to 10L)
    val ys = bagL(1L to 10L)
    val zs = bagL(Seq(4L, 4L, 7L, 10L))
    val r = onSpark {
      for { x <- xs; y <- ys; if x % 2 == y % 2 }
        yield (x, y, zs.count(z => z == x + y))
    }
    val plan = r.toDF.queryExecution.executedPlan.toString
    plan should not include regex("(?i)cartesian")
    val zseq = Seq(4L, 4L, 7L, 10L)
    val seqRef = for { x <- 1L to 10L; y <- 1L to 10L; if x % 2 == y % 2 }
      yield (x, y, zseq.count(z => z == x + y).toLong)
    r.collect().sorted shouldBe seqRef.sorted
    // alongside an EXISTS guard — both derivations compose
    val r2 = onSpark {
      for { x <- xs; if ys.exists(y => y == x * 2) }
        yield (x, zs.count(z => z == x))
    }
    val seqRef2 = for { x <- 1L to 10L; if (1L to 10L).exists(y => y == x * 2) }
      yield (x, zseq.count(z => z == x).toLong)
    r2.collect().sorted shouldBe seqRef2.sorted
  }

  it should "derive a fold-comparing guard (correlated HAVING) via sumJoin + filter" in {
    val xs = bagL(1L to 20L)
    val ys = bagL(Seq(1L, 2L, 2L, 3L, 3L, 3L))
    val yseq = Seq(1L, 2L, 2L, 3L, 3L, 3L)
    val r = onSpark {
      for { x <- xs; if ys.count(y => y == x % 5) >= 2L } yield x * 10L
    }
    val seqRef = for { x <- 1L to 20L; if yseq.count(y => y == x % 5) >= 2 }
      yield x * 10L
    r.collect().sorted shouldBe seqRef.sorted
    // guard fold at level 2 of a join chain; later shape unaffected
    val zs = bagL(1L to 20L)
    val r2 = onSpark {
      for { x <- xs; z <- zs; if x % 4 == z % 4
            if ys.count(y => y == (x + z) % 5) == 3L } yield (x, z)
    }
    val seqRef2 = for { x <- 1L to 20L; z <- 1L to 20L; if x % 4 == z % 4
      if yseq.count(y => y == (x + z) % 5) == 3 } yield (x, z)
    r2.collect().sorted shouldBe seqRef2.sorted
    // a guard fold COMBINED with a head fold in the same comprehension
    val r3 = onSpark {
      for { x <- xs; if ys.count(y => y == x % 5) >= 2L }
        yield (x, ys.count(y => y == x % 7))
    }
    val seqRef3 = for { x <- 1L to 20L; if yseq.count(y => y == x % 5) >= 2 }
      yield (x, yseq.count(y => y == x % 7).toLong)
    r3.collect().sorted shouldBe seqRef3.sorted
  }

  it should "derive a correlated top-k head fold via the bounded-heap algebra" in {
    val xs = bagL(1L to 10L)
    val ys = bagL(1L to 40L)
    // top(3) feeds a plain List .sum — the OUTER sum is local code over
    // the substituted fold value, only the top(3) pre-aggregates
    val r = onSpark {
      for { x <- xs }
        yield (x, (for { y <- ys; if y % 10 == x % 10 } yield y).top(3).sum)
    }
    val seqRef = for { x <- 1L to 10L }
      yield (x, (1L to 40L).filter(y => y % 10 == x % 10).sorted.reverse.take(3).sum)
    r.collect().sorted shouldBe seqRef.sorted
    // bottom(n) with the List value returned directly
    val r2 = onSpark {
      for { x <- xs } yield (x, ys.withFilter(y => y % 10 == x % 10).bottom(2))
    }
    val seqRef2 = for { x <- 1L to 10L }
      yield (x, (1L to 40L).filter(y => y % 10 == x % 10).sorted.take(2).toList)
    r2.collect().toMap shouldBe seqRef2.toMap
  }

  it should "fuse a groupBy comprehension into one foldGroup (FoldGroupFusion)" in {
    val xs = bagL(1L to 100L)
    val fused = onSpark {
      for { g <- xs.groupBy(x => x % 7); if g.values.size >= 14 }
        yield (g.key, g.values.size,
          g.values.filter(_ > 50L).map(v => v * 2L).sum, g.values.min)
    }
    // fused = ONE foldGroup: no group materialization (MapGroups) in plan
    val plan = fused.toDF.queryExecution.executedPlan.toString
    plan should not include "MapGroups"
    val seqRef = (1L to 100L).groupBy(_ % 7).toSeq.collect {
      case (k, vs) if vs.size >= 14 =>
        (k, vs.size, vs.filter(_ > 50L).map(_ * 2L).sum, vs.min)
    }
    fused.collect().sorted shouldBe seqRef.sorted
    // exists/forall folds — the HAVING predicates — fuse too
    val preds = onSpark {
      for { g <- xs.groupBy(x => x % 7); if g.values.exists(_ > 95L) }
        yield (g.key, g.values.forall(_ >= 7L))
    }
    preds.toDF.queryExecution.executedPlan.toString should not include "MapGroups"
    val predRef = (1L to 100L).groupBy(_ % 7).toSeq.collect {
      case (k, vs) if vs.exists(_ > 95L) => (k, vs.forall(_ >= 7L))
    }
    preds.collect().sorted shouldBe predRef.sorted
  }

  it should "fuse groupBy yields that alias g.values/g.key through block vals" in {
    // the reference's FoldGroup "of case classes multiple times" spelling
    // (BaseCodegenIntegrationSpec.scala:322-336): the group's values and
    // key are bound to local vals, folds run on the alias, fold RESULTS
    // feed derived vals and arbitrary arithmetic/string interpolation
    val xs = bagL(1L to 100L)
    val fused = onSpark {
      for { g <- xs.groupBy(x => x / 10) } yield {
        val values = g.values
        val decade = g.key
        val total = values.size
        val avg = values.map(_ * 10L).sum / (total * 10.0)
        val mn = values.min
        val mx = values.max
        (s"${decade * 10} - ${decade * 10 + 9}", total, avg, mn, mx)
      }
    }
    fused.toDF.queryExecution.executedPlan.toString should not include "MapGroups"
    val seqRef = (1L to 100L).groupBy(_ / 10).toSeq.map { case (k, vs) =>
      (s"${k * 10} - ${k * 10 + 9}", vs.size, vs.map(_ * 10L).sum / (vs.size * 10.0),
        vs.min, vs.max)
    }
    fused.collect().sorted shouldBe seqRef.sorted
    // alias inside a GUARD condition block, chained alias in the yield
    val guarded = onSpark {
      for { g <- xs.groupBy(x => x % 7)
            if { val vs = g.values; vs.size >= 14 } }
        yield { val vs = g.values; val ws = vs; (g.key, ws.sum) }
    }
    guarded.toDF.queryExecution.executedPlan.toString should not include "MapGroups"
    val guardRef = (1L to 100L).groupBy(_ % 7).toSeq.collect {
      case (k, vs) if vs.size >= 14 => (k, vs.sum)
    }
    guarded.collect().sorted shouldBe guardRef.sorted
    // a complex (tuple) key destructured from the alias still fuses
    val pairs = DataBag((1L to 60L).map(i => (i % 4, i % 3, i)))
    val complexKey = onSpark {
      for { g <- pairs.groupBy(p => (p._1, p._2)) } yield {
        val (a, b) = g.key
        (a, b, g.values.map(_._3).sum)
      }
    }
    complexKey.toDF.queryExecution.executedPlan.toString should not include "MapGroups"
    val ckRef = (1L to 60L).map(i => (i % 4, i % 3, i)).groupBy(p => (p._1, p._2))
      .toSeq.map { case ((a, b), vs) => (a, b, vs.map(_._3).sum) }
    complexKey.collect().sorted shouldBe ckRef.sorted
  }

  it should "fuse multiple groupBys in one comprehension and join pre-aggregates" in {
    // the reference's FoldGroup "with multiple groups in the same
    // comprehension" (BaseCodegenIntegrationSpec.scala:365-372): two
    // grouped bags joined on key — each side pre-aggregates via foldGroup
    // (no group Seq ever materializes), the key guard derives the equi
    // join between the K-row aggregated relations
    val cannes = DataBag((1L to 80L).map(i => (1900L + i % 40, i)))
    val berlin = DataBag((1L to 60L).map(i => (1910L + i % 30, i * 2)))
    val r = onSpark {
      for {
        can10 <- cannes.groupBy(_._1 / 10)
        ber10 <- berlin.groupBy(_._1 / 10)
        if can10.key == ber10.key
      } yield (can10.key, can10.values.size, ber10.values.map(_._2).sum)
    }
    val plan = r.toDF.queryExecution.executedPlan.toString
    plan should not include "MapGroups"
    val canRef = (1L to 80L).map(i => (1900L + i % 40, i)).groupBy(_._1 / 10)
    val berRef = (1L to 60L).map(i => (1910L + i % 30, i * 2)).groupBy(_._1 / 10)
    val seqRef = for {
      (ck, cvs) <- canRef.toSeq
      (bk, bvs) <- berRef.toSeq
      if ck == bk
    } yield (ck, cvs.size, bvs.map(_._2).sum)
    r.collect().sorted shouldBe seqRef.sorted
    // a guard COMPARING folds across the two groups fuses on both sides
    val guarded = onSpark {
      for {
        can10 <- cannes.groupBy(_._1 / 10)
        ber10 <- berlin.groupBy(_._1 / 10)
        if can10.key == ber10.key
        if can10.values.size > ber10.values.size
      } yield (can10.key, can10.values.size, ber10.values.size)
    }
    guarded.toDF.queryExecution.executedPlan.toString should not include "MapGroups"
    val guardRef = for {
      (ck, cvs) <- canRef.toSeq
      (bk, bvs) <- berRef.toSeq
      if ck == bk && cvs.size > bvs.size
    } yield (ck, cvs.size, bvs.size)
    guarded.collect().sorted shouldBe guardRef.sorted
    // mixed chain: a grouped bag joined with a PLAIN bag on the group key
    val dims = DataBag((188L to 196L).map(d => (d, s"dim$d")))
    val mixed = onSpark {
      for {
        g <- cannes.groupBy(_._1 / 10)
        d <- dims
        if g.key == d._1
      } yield (d._2, g.values.size)
    }
    mixed.toDF.queryExecution.executedPlan.toString should not include "MapGroups"
    val mixedRef = for {
      (ck, cvs) <- canRef.toSeq
      (dk, dn) <- (188L to 196L).map(d => (d, s"dim$d"))
      if ck == dk
    } yield (dn, cvs.size)
    mixed.collect().sorted shouldBe mixedRef.sorted
    // a non-fusible side (values used beyond folds) falls back to the
    // materializing groupBy on THAT side only — same results
    val partial = onSpark {
      for {
        can10 <- cannes.groupBy(_._1 / 10)
        ber10 <- berlin.groupBy(_._1 / 10)
        if can10.key == ber10.key
      } yield (can10.key, can10.values.size, ber10.values.map(_._2).sorted.take(2).sum)
    }
    val partialRef = for {
      (ck, cvs) <- canRef.toSeq
      (bk, bvs) <- berRef.toSeq
      if ck == bk
    } yield (ck, cvs.size, bvs.map(_._2).sorted.take(2).sum)
    partial.collect().sorted shouldBe partialRef.sorted
  }

  it should "fuse Group-pattern generators over groupBy bags" in {
    // the reference's FoldGroup "with duplicate group names" spelling
    // (BaseCodegenIntegrationSpec.scala:350-363): the generator
    // destructures Group(decade, dmovies) — the macro desugars the
    // pattern to .key/.values and the plain-binder fusion applies
    val movies = DataBag((1L to 90L).map(i => (1920L + i % 60, i % 10)))
    val least = onSpark {
      for { g @ Group(decade, dmovies) <- movies.groupBy(_._1 / 10) }
        yield (decade, dmovies.size, dmovies.map(_._2).min)
    }
    val ref = (1L to 90L).map(i => (1920L + i % 60, i % 10)).groupBy(_._1 / 10)
    least.collect().sorted shouldBe
      ref.toSeq.map { case (k, vs) => (k, vs.size, vs.map(_._2).min) }.sorted
    // without the `g @` prefix (the reference's exact spelling)
    val most = onSpark {
      for { Group(decade, dmovies) <- movies.groupBy(_._1 / 10)
            if dmovies.size >= 10 }
        yield (decade, dmovies.size, dmovies.map(_._2).max)
    }
    most.toDF.queryExecution.executedPlan.toString should not include "MapGroups"
    most.collect().sorted shouldBe ref.toSeq.collect {
      case (k, vs) if vs.size >= 10 => (k, vs.size, vs.map(_._2).max)
    }.sorted
    // a wildcard values slot (key-only) still derives
    val keys = onSpark {
      for { Group(decade, _) <- movies.groupBy(_._1 / 10) } yield decade * 10
    }
    keys.collect().sorted shouldBe ref.keySet.toSeq.map(_ * 10).sorted
    // pattern spelling in a MULTI-generator chain joins pre-aggregates
    val later = DataBag((1L to 40L).map(i => (1950L + i % 30, i)))
    val joined = onSpark {
      for {
        Group(d1, m1) <- movies.groupBy(_._1 / 10)
        Group(d2, m2) <- later.groupBy(_._1 / 10)
        if d1 == d2
      } yield (d1, m1.size, m2.size)
    }
    joined.toDF.queryExecution.executedPlan.toString should not include "MapGroups"
    val laterRef = (1L to 40L).map(i => (1950L + i % 30, i)).groupBy(_._1 / 10)
    val joinedRef = for {
      (k1, v1) <- ref.toSeq
      (k2, v2) <- laterRef.toSeq
      if k1 == k2
    } yield (k1, v1.size, v2.size)
    joined.collect().sorted shouldBe joinedRef.sorted
    // non-fold use of the values bind falls back to the materializing
    // path — same results
    val sortedTake = onSpark {
      for { Group(d, ms) <- movies.groupBy(_._1 / 10) }
        yield (d, ms.map(_._2).sorted.take(2).sum)
    }
    sortedTake.collect().sorted shouldBe
      ref.toSeq.map { case (k, vs) => (k, vs.map(_._2).sorted.take(2).sum) }.sorted
  }

  it should "pass non-fusible groupBy comprehensions through to the unfused path" in {
    val xs = bagL(1L to 30L)
    // `.sorted.take(2)` is not a derivable fold — the comprehension runs
    // via the group-materializing groupBy, unchanged semantics
    val r = onSpark {
      for { g <- xs.groupBy(x => x % 5) } yield (g.key, g.values.sorted.take(2).sum)
    }
    val seqRef = (1L to 30L).groupBy(_ % 5).toSeq.map { case (k, vs) =>
      (k, vs.sorted.take(2).sum)
    }
    r.collect().sorted shouldBe seqRef.sorted
  }

  it should "reject underivable head folds at compile time" in {
    // non-equality correlation: no key to pre-aggregate against (an
    // UNCORRELATED ys.sum would hoist instead — see the hoist tests)
    """
    val xs = bagL(1L to 5L)
    val ys = bagL(1L to 5L)
    onSpark { for { x <- xs } yield (x, ys.count(y => y > x)) }
    """ shouldNot compile
    // non-equality correlated min: no key to pre-aggregate against (a
    // KEYED correlated min derives via minMaxJoin — see its tests)
    """
    val xs = bagL(1L to 5L)
    val ys = bagL(1L to 5L)
    onSpark { for { x <- xs } yield (x, ys.withFilter(y => y > x).min) }
    """ shouldNot compile
    // a generator-dependent mapped value cannot pre-aggregate
    """
    val xs = bagL(1L to 5L)
    val ys = bagL(1L to 5L)
    onSpark { for { x <- xs } yield (x, ys.withFilter(y => y == x).map(y => y + x).sum) }
    """ shouldNot compile
  }

  it should "evaluate composite-key sides in their OWN pattern scopes (no cross-capture)" in {
    // two withFilter patterns REUSE names for different components — each
    // key side must see its own lambda's binding, not the innermost one
    val xs = bagL(1L to 30L)
    val pairs = DataBag((1L to 20L).map(i => (i % 5, i % 3)))
    val r = onSpark {
      for { x <- xs } yield (x,
        (for { p <- pairs; if p._1 == x % 5; if p._2 == x % 3 } yield 1L).sum)
    }
    val pairSeq = (1L to 20L).map(i => (i % 5, i % 3))
    val seqRef = for { x <- 1L to 30L }
      yield (x, pairSeq.count(p => p._1 == x % 5 && p._2 == x % 3).toLong)
    r.collect().sorted shouldBe seqRef.sorted
  }

  it should "not let an Eq-shaped fold guard steal a level's join key" in {
    // `ys.count(...) == z` is equality-shaped; it must not consume the
    // join-key slot and demote the REAL equi guard to a post filter
    val xs = bagL(1L to 12L)
    val zs = bagL(1L to 12L)
    val ys = bagL(Seq(1L, 1L, 2L, 3L))
    val r = onSpark {
      for { x <- xs; z <- zs; if ys.count(y => y == x % 4) == z
            if x % 3 == z % 3 } yield (x, z)
    }
    val plan = r.toDF.queryExecution.executedPlan.toString
    plan should not include regex("(?i)cartesian")
    val yseq = Seq(1L, 1L, 2L, 3L)
    val seqRef = for { x <- 1L to 12L; z <- 1L to 12L
      if yseq.count(y => y == x % 4).toLong == z; if x % 3 == z % 3 } yield (x, z)
    r.collect().sorted shouldBe seqRef.sorted
  }

  it should "reject multi-inequality forall guards; ctor-bag guards localize (r14)" in {
    // forall over a conjunction of inequalities is TWO anti joins, not one
    // composite-key anti join — deriving it would silently keep rows
    """
    val xs = bagL(1L to 5L)
    val pairs = DataBag(Seq((1L, 2L)))
    onSpark { for { x <- xs; if pairs.forall(p => p._1 != x && p._2 != x + 1) } yield x }
    """ shouldNot compile
    // a literal DataBag(seq) ctor in an un-semi-joinable guard no longer
    // aborts: it re-roots onto LocalBag and evaluates per row (r14's
    // guard-position Normalize), with Seq-identical semantics
    val xs = bagL(1L to 5L)
    val loc = onSpark {
      for { x <- xs; if DataBag(Seq(1L, 2L)).exists(w => w > x) } yield x
    }
    loc.collect().sorted shouldBe (1L to 5L).filter(x => Seq(1L, 2L).exists(_ > x)).sorted
  }

  it should "reject underivable distributed-bag guards at compile time" in {
    // non-equality correlation: no semi-join key to derive
    """
    val xs = bagL(1L to 5L)
    val ys = bagL(1L to 5L)
    onSpark { for { x <- xs; if ys.exists(y => y > x) } yield x }
    """ shouldNot compile
    // a generator-dependent reduction: neither hoistable nor derivable
    """
    val xs = bagL(1L to 5L)
    val ys = bagL(1L to 5L)
    onSpark { for { x <- xs; if ys.reduce(0L)((a, b) => a + b + x) > 3L } yield x }
    """ shouldNot compile
    // emptiness without a separable key equality: no join to derive
    """
    val xs = bagL(1L to 5L)
    val ys = bagL(1L to 5L)
    onSpark { for { x <- xs; if ys.withFilter(y => y > x).nonEmpty } yield x }
    """ shouldNot compile
    // forall with a conjunction is not a single anti join
    """
    val xs = bagL(1L to 5L)
    val ys = bagL(1L to 5L)
    onSpark { for { x <- xs; if ys.forall(y => y != x && y > 0L) } yield x }
    """ shouldNot compile
  }

  it should "reject a DISTRIBUTED bag captured in the yield at compile time" in {
    // generator-correlated without an equality key (an uncorrelated
    // zs.sum would hoist into a driver val instead)
    """
    val xs = bagL(1L to 5L)
    val ys = bagL(1L to 5L)
    val zs = bagL(6L to 9L)
    onSpark { for { x <- xs; y <- ys; if x == y } yield (x, zs.count(z => z > x)) }
    """ shouldNot compile
  }

  it should "unnest a dependent nested-comprehension generator into a join" in {
    val xs = bagL(1L to 30L)
    val ys = bagL(1L to 40L)
    val r = onSpark {
      for {
        x <- xs
        v <- (for { y <- ys; if y % 7 == x % 5 } yield y * 10 + x)
      } yield (x, v)
    }
    val plan = r.toDF.queryExecution.executedPlan.toString
    plan should not include regex("(?i)cartesian")
    plan should not include regex("(?i)BroadcastNestedLoop")
    val seqRef = for {
      x <- 1L to 30L
      v <- (for { y <- 1L to 40L; if y % 7 == x % 5 } yield y * 10 + x)
    } yield (x, v)
    r.collect().sorted shouldBe seqRef.sorted
  }

  it should "unnest a multi-generator inner comprehension, guards on the binder included" in {
    val xs = bagL(1L to 10L)
    val ys = bagL(1L to 12L)
    val zs = bagL(1L to 8L)
    val r = onSpark {
      for {
        x <- xs
        v <- (for { y <- ys; if y % 3 == x % 3; z <- zs; if z % 4 == y % 4 }
          yield y * 100 + z)
        if v % 2 == 0L
        w <- zs
        if w % 5 == v % 5
      } yield (x, v, w)
    }
    val plan = r.toDF.queryExecution.executedPlan.toString
    plan should not include regex("(?i)cartesian")
    val seqRef = for {
      x <- 1L to 10L
      v <- (for { y <- 1L to 12L; if y % 3 == x % 3; z <- 1L to 8L; if z % 4 == y % 4 }
        yield y * 100 + z)
      if v % 2 == 0L
      w <- 1L to 8L
      if w % 5 == v % 5
    } yield (x, v, w)
    r.collect().sorted shouldBe seqRef.sorted
  }

  it should "unnest when the inner yield is used several times downstream" in {
    val xs = bagL(1L to 15L)
    val ys = bagL(1L to 9L)
    val r = onSpark {
      for {
        x <- xs
        v <- (for { y <- ys; if y % 4 == x % 4 } yield y + x)
      } yield (x, v, v * v, v % 3)
    }
    val seqRef = for {
      x <- 1L to 15L
      v <- (for { y <- 1L to 9L; if y % 4 == x % 4 } yield y + x)
    } yield (x, v, v * v, v % 3)
    r.collect().sorted shouldBe seqRef.sorted
  }

  it should "unnest a PATTERN-bound nested generator when the inner yield is a tuple" in {
    val xs = bagL(1L to 12L)
    val ys = bagL(1L to 20L)
    val r = onSpark {
      for {
        x <- xs
        (a, b) <- (for { y <- ys; if y % 6 == x % 6 } yield (y, y * x))
        if b % 3 == 0L
      } yield (x, a, b + 1)
    }
    val plan = r.toDF.queryExecution.executedPlan.toString
    plan should not include regex("(?i)cartesian")
    val seqRef = for {
      x <- 1L to 12L
      (a, b) <- (for { y <- 1L to 20L; if y % 6 == x % 6 } yield (y, y * x))
      if b % 3 == 0L
    } yield (x, a, b + 1)
    r.collect().sorted shouldBe seqRef.sorted
  }

  it should "unnest DOUBLY nested generators through repeated re-expansion" in {
    val xs = bagL(1L to 8L)
    val ys = bagL(1L to 10L)
    val zs = bagL(1L to 6L)
    // the inner comprehension's own generator is itself a nested
    // comprehension — one splice per expansion, the re-expanded macro
    // picks up the next level
    val r = onSpark {
      for {
        x <- xs
        v <- (for {
          u <- (for { z <- zs; if z % 3 == x % 3 } yield z + 100L)
          y <- ys
          if y % 2 == u % 2
        } yield u * 1000L + y)
      } yield (x, v)
    }
    val plan = r.toDF.queryExecution.executedPlan.toString
    plan should not include regex("(?i)cartesian")
    val seqRef = for {
      x <- 1L to 8L
      v <- (for {
        u <- (for { z <- 1L to 6L; if z % 3 == x % 3 } yield z + 100L)
        y <- 1L to 10L
        if y % 2 == u % 2
      } yield u * 1000L + y)
    } yield (x, v)
    r.collect().sorted shouldBe seqRef.sorted
  }

  it should "unnest a CASE-CLASS-bound nested generator (synthetic ctor alignment)" in {
    val xs = bagL(1L to 10L)
    val ys = bagL(1L to 14L)
    val r = onSpark {
      for {
        x <- xs
        PayRow(ok, cents) <- (for { y <- ys; if y % 4 == x % 4 }
          yield PayRow(y, y * 3L))
        if cents % 2 == 0L
      } yield (x, ok, cents)
    }
    val plan = r.toDF.queryExecution.executedPlan.toString
    plan should not include regex("(?i)cartesian")
    val seqRef = for {
      x <- 1L to 10L
      PayRow(ok, cents) <- (for { y <- 1L to 14L; if y % 4 == x % 4 }
        yield PayRow(y, y * 3L))
      if cents % 2 == 0L
    } yield (x, ok, cents)
    r.collect().sorted shouldBe seqRef.sorted
  }

  it should "keep a user guard spelled as a two-case boolean match (not the refut check)" in {
    // the guard's shape coincides with scalac's check$ifrefutable (a
    // 2-case true/false match) — only the REAL check (param named
    // check$ifrefutable$N) may be dropped as identity
    val xs = bagL(1L to 6L)
    val ys = bagL(1L to 9L)
    val r = onSpark {
      for {
        x <- xs
        v <- (for { y <- ys; if y % 3 == x % 3 } yield (y, y * 2L))
        if (v match { case (1L, _) => true; case _ => false })
      } yield (x, v._1, v._2)
    }
    val seqRef = for {
      x <- 1L to 6L
      v <- (for { y <- 1L to 9L; if y % 3 == x % 3 } yield (y, y * 2L))
      if (v match { case (1L, _) => true; case _ => false })
    } yield (x, v._1, v._2)
    r.collect().sorted shouldBe seqRef.sorted
  }

  it should "not treat a custom extractor with plain binds as a tuple pattern" in {
    // Swap's components are NOT positionally the tuple's — substituting
    // a->first, b->second would silently swap every row; must abort
    """
    object Swap { def unapply(t: (Long, Long)): Option[(Long, Long)] = Some((t._2, t._1)) }
    val xs = bagL(1L to 5L)
    val ys = bagL(1L to 5L)
    onSpark { for { x <- xs; Swap(a, b) <- (for { y <- ys; if y == x } yield (y, y * 2L)) } yield (x, a, b) }
    """ shouldNot compile
    // a local def whose param shadows the binder name poisons the
    // name-keyed substitution count — decline (abort), never over-replace
    """
    val xs = bagL(1L to 5L)
    val ys = bagL(1L to 5L)
    onSpark { for { x <- xs; w <- (for { y <- ys; if y == x } yield y) } yield { def g(w: Long) = w * 2; g(w) } }
    """ shouldNot compile
  }

  it should "still reject dependent bags that are not comprehension chains" in {
    // a method call building a DataBag from the row: not a spliceable
    // chain — the one-job-per-element cliff aborts as before
    """
    val xs = bagL(1L to 5L)
    def f(x: Long): DataBag[Long] = DataBag(Seq(x, x + 1))
    onSpark { for { x <- xs; y <- f(x) } yield y }
    """ shouldNot compile
    // capture hazard: the inner yield's free name is re-bound by a lambda
    // in a downstream guard — the conservative check declines, so the
    // dependent-generator abort stands instead of a mis-capture
    """
    val xs = bagL(1L to 5L)
    val ys = bagL(1L to 5L)
    onSpark { for { x <- xs; v <- (for { y <- ys; if y == x } yield y)
      if ys.exists(y => y == v) } yield v }
    """ shouldNot compile
  }

  it should "evaluate val destructuring of a composite group key (reference val-destructuring shape)" in {
    val xs = bagL(1L to 40L)
    val r = onSpark {
      for { g <- xs.groupBy(v => (v % 4, v % 3)) } yield {
        val (a, b) = g.key
        (a, b, g.values.size)
      }
    }
    val e = (1L to 40L).groupBy(v => (v % 4, v % 3)).toSeq.map {
      case ((a, b), vs) => (a, b, vs.size)
    }
    r.collect().sorted shouldBe e.sorted
  }

  it should "leave non-DataBag comprehensions untouched" in {
    val r = onSpark { for { x <- Seq(1, 2, 3); y <- Seq(10, 20); if x % 2 == y % 3 } yield x + y }
    r shouldBe (for { x <- Seq(1, 2, 3); y <- Seq(10, 20); if x % 2 == y % 3 } yield x + y)
  }

  it should "snapshot MUTABLE variables captured in quoted lambdas at build time (DSCF semantics)" in {
    // the classic fixpoint-loop trap: Datasets defer execution, so an
    // un-staged var capture would make a later job observe the var's
    // LATEST value. The macro applies the reference's DSCF semantics —
    // the captured var snapshots into a val at chain-BUILD time — so the
    // quoted program means what it meant at that program point.
    val xs = bagL(1L to 10L)
    var p = 2L
    val r = onSpark { for { x <- xs; if x % p != 0L } yield x }
    p = 1L // would filter EVERYTHING if the capture were live
    r.collect().sorted shouldBe (1L to 10L).filter(_ % 2L != 0L)
    // per-iteration semantics in a driver loop (the sieve's shape)
    var primes: DataBag[Long] = bagL(2L to 30L)
    var q = 1L
    while (q < 5L) {
      q += 1L
      primes = onSpark {
        for { n <- primes; if n == q || n % q != 0L } yield n
      }
    }
    primes.collect().sorted shouldBe Seq(2L, 3L, 5L, 7L, 11L, 13L, 17L, 19L, 23L, 29L)
    // var in BAG position builds eagerly from the current value
    var cur = bagL(1L to 5L)
    val doubled = onSpark { for { x <- cur } yield 2L * x }
    cur = bagL(Seq(99L)) // reassignment after build must not matter
    doubled.collect().sorted shouldBe Seq(2L, 4L, 6L, 8L, 10L)
    // a var captured inside a BAG-EXPRESSION lambda (a groupBy key — it
    // defers and distributes exactly like a guard) snapshots too
    var m = 3L
    val grouped = onSpark {
      for (g <- bagL(1L to 12L).groupBy(v => v % m)) yield (g.key, g.values.size)
    }
    m = 1000L // would collapse to one group if the capture were live
    grouped.collect().sorted shouldBe
      (1L to 12L).groupBy(_ % 3L).toSeq.map { case (k, vs) => (k, vs.size.toLong) }.sorted
    // a same-named binder inside the chain poisons the snapshot
    // substitution — abort rather than mis-capture
    """
    val xs = bagL(1L to 10L)
    var p = 2L
    onSpark { for { x <- xs; if x % p != 0L } yield { val p = x; p * 2L } }
    """ shouldNot compile
  }

  it should "abort on mutable CLASS FIELDS read inside quoted lambdas (Select spelling)" in {
    // a member var surfaces as Select(This(...), getter) in the typed tree
    // — not substitutable by the name-based snapshot — so the macro must
    // abort with guidance instead of letting the read defer (the silent
    // wrong-answer trap the local-var snapshot closes)
    """
    class Holder {
      var p = 2L
      def run(xs: graft.api.DataBag[Long]) =
        graft.api.comprehensions.onSpark { for { x <- xs; if x % p != 0L } yield x }
    }
    """ shouldNot compile
    """
    class Holder2 {
      var p = 2L
      def run(xs: graft.api.DataBag[Long]) =
        graft.api.comprehensions.onSpark { for { x <- xs; if x % this.p != 0L } yield x }
    }
    """ shouldNot compile
    // an OBJECT's var read through its module qualifier aborts too
    """
    object Conf { var p = 2L }
    class Holder3 {
      def run(xs: graft.api.DataBag[Long]) =
        graft.api.comprehensions.onSpark { for { x <- xs; if x % Conf.p != 0L } yield x }
    }
    """ shouldNot compile
    // the guided manual-snapshot spelling compiles and pins build-time value
    class Holder4 {
      var p = 2L
      def run(xs: DataBag[Long]): DataBag[Long] = {
        val p0 = p
        onSpark { for { x <- xs; if x % p0 != 0L } yield x }
      }
    }
    val h = new Holder4
    val r = h.run(bagL(1L to 10L))
    h.p = 1000L // must not matter: the snapshot happened at build time
    r.collect().sorted shouldBe (1L to 10L).filter(_ % 2L != 0L)
    // a generator binder's OWN var field is per-element row data, not a
    // capture — reads stay derivable
    val rows = DataBag((1L to 6L).map(i => new VarCell(i)))
    val kept = onSpark { for { c <- rows; if c.v % 2L == 0L } yield c.v }
    kept.collect().sorted shouldBe Seq(2L, 4L, 6L)
    // a member var in top-level BAG position is an EAGER read at
    // chain-build time (no deferred-read hazard) — must stay compilable;
    // only reads inside lambdas (guards, yields, groupBy keys) abort
    class HolderHead {
      var bagVar: DataBag[Long] = DataBag((1L to 5L).toSeq)
      def run(): DataBag[Long] = onSpark { for { x <- bagVar } yield x + 1L }
    }
    (new HolderHead).run().collect().sorted shouldBe (2L to 6L)
  }

  it should "inline same-object helper defs building dependent bags (Lib.expand)" in {
    // a dependent generator whose bag is BUILT BY A METHOD CALL previously
    // aborted; the macro now finds the helper's DefDef in the compilation
    // unit (same-object scope), beta-reduces it into the generator position
    // (the reference's Lib.expand, compiler/lib/Lib.scala:40-55), and the
    // spliced chain derives the same equi join as the written-out spelling
    val xs = DataBag((1L to 30L).map(i => (i, i % 5)))
    val ys = DataBag((1L to 40L).map(i => (i * 2, i % 5)))
    def matching(x: (Long, Long)): DataBag[(Long, Long)] =
      for { y <- ys; if y._2 == x._2 } yield y
    val r = onSpark { for { x <- xs; y <- matching(x) } yield (x._1, y._1) }
    val plan = r.toDF.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    plan should not include regex("(?i)cartesian")
    plan should not include regex("(?i)BroadcastNestedLoop")
    "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)".r
      .findAllIn(plan).length shouldBe 1
    val exp = for {
      x <- (1L to 30L).map(i => (i, i % 5))
      y <- (1L to 40L).map(i => (i * 2, i % 5)); if y._2 == x._2
    } yield (x._1, y._1)
    r.collect().sorted shouldBe exp.sorted
  }

  it should "inline NESTED same-object helper calls with expression args" in {
    val xs = DataBag((1L to 20L).map(i => (i, i % 4)))
    val ys = DataBag((1L to 50L).map(i => (i, i % 4)))
    // outer helper delegates to an inner one; the argument `x._2 + 0L` is a
    // computed expression (substituted directly, same purity premise as
    // guard reordering); the inner call resolves by name in the untyped
    // recursive pass
    def libNarrow(k: Long): DataBag[(Long, Long)] =
      for { y <- ys; if y._2 == k } yield y
    def libMatch(x: (Long, Long)): DataBag[(Long, Long)] = libNarrow(x._2 + 0L)
    val r = onSpark { for { x <- xs; y <- libMatch(x) } yield (x._1, y._1) }
    val exp = for {
      x <- (1L to 20L).map(i => (i, i % 4))
      y <- (1L to 50L).map(i => (i, i % 4)); if y._2 == x._2
    } yield (x._1, y._1)
    r.collect().sorted shouldBe exp.sorted
  }

  it should "inline helper defs consumed by correlated folds in the HEAD" in {
    // a DataBag-returning helper call in the yield was an executor-side
    // abort; inlining it (typed-side verified names only) hands the
    // correlated-fold machinery a chain — pre-aggregate + outer join
    val xs = DataBag((1L to 10L).map(i => (i, i % 3)))
    val ys = DataBag((1L to 30L).map(i => (i, i % 3)))
    def matched(x: (Long, Long)): DataBag[Long] =
      for { y <- ys; if y._2 == x._2 } yield y._1
    val r = onSpark { for { x <- xs } yield (x._1, matched(x).sum) }
    val ysSeq = (1L to 30L).map(i => (i, i % 3))
    val exp = (1L to 10L).map(i => (i, i % 3)).map { x =>
      (x._1, ysSeq.filter(_._2 == x._2).map(_._1).sum)
    }
    r.collect().sorted shouldBe exp.sorted
    // and in a GUARD position (the HAVING shape)
    val g = onSpark { for { x <- xs; if matched(x).size > 9L } yield x._1 }
    val expG = (1L to 10L).map(i => (i, i % 3))
      .filter(x => ysSeq.count(_._2 == x._2) > 9).map(_._1)
    g.collect().sorted shouldBe expG.sorted
  }

  it should "inline curried and default-argument helper defs" in {
    val xs = DataBag((1L to 20L).map(i => (i, i % 3)))
    val ys = DataBag((1L to 30L).map(i => (i, i % 3)))
    // curried: two explicit parameter lists peel into one flattened
    // substitution (the typed call carries every list)
    def curried(x: (Long, Long))(lo: Long): DataBag[(Long, Long)] =
      for { y <- ys; if y._2 == x._2 && y._1 > lo } yield y
    val r1 = onSpark { for { x <- xs; y <- curried(x)(5L) } yield (x._1, y._1) }
    val e1 = for {
      x <- (1L to 20L).map(i => (i, i % 3))
      y <- (1L to 30L).map(i => (i, i % 3)); if y._2 == x._2 && y._1 > 5L
    } yield (x._1, y._1)
    r1.collect().sorted shouldBe e1.sorted
    // default argument: scalac rewrites the call site to pass the
    // synthetic default accessor — it substitutes like any argument and
    // re-resolves at the splice site
    def dflt(x: (Long, Long), lo: Long = 7L): DataBag[(Long, Long)] =
      for { y <- ys; if y._2 == x._2 && y._1 > lo } yield y
    val r2 = onSpark { for { x <- xs; y <- dflt(x) } yield (x._1, y._1) }
    val e2 = for {
      x <- (1L to 20L).map(i => (i, i % 3))
      y <- (1L to 30L).map(i => (i, i % 3)); if y._2 == x._2 && y._1 > 7L
    } yield (x._1, y._1)
    r2.collect().sorted shouldBe e2.sorted
  }

  it should "still abort on recursive and cross-file helper defs" in {
    // recursive helper: the inliner's cycle check (or the dependent-bag
    // abort when the snippet's detached defs are not unit-resolvable)
    // must reject at compile time — never loop or defer to runtime
    """
    def rec(x: (Long, Long)): graft.api.DataBag[(Long, Long)] =
      for { y <- rec(x); if y._2 == x._2 } yield y
    val xs = graft.api.DataBag(Seq((1L, 1L)))
    graft.api.comprehensions.onSpark { for { x <- xs; y <- rec(x) } yield (x._1, y._1) }
    """ shouldNot compile
    // helper defined in ANOTHER FILE (graft.TestSpark's object scope is not
    // on this call site's owner chain): no AST registry exists, so the
    // dependent method-built bag keeps its abort
    """
    val xs = graft.api.DataBag(Seq((1L, 1L)))
    graft.api.comprehensions.onSpark {
      for { x <- xs; y <- graft.api.CrossFileLib.matching(x) } yield (x._1, y._1)
    }
    """ shouldNot compile
  }

  it should "inline cross-file @lib helper defs into join derivations (same run)" in {
    val xs = DataBag((1L to 20L).map(i => (i, i % 3)))
    val ys = DataBag((1L to 30L).map(i => (i, i % 3)))
    val r = onSpark {
      for { x <- xs; y <- CrossFileLibX.matching(x, ys) } yield (x._1, y._1)
    }
    val plan = r.toDF.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    plan should not include regex("(?i)cartesian")
    plan should not include regex("(?i)BroadcastNestedLoop")
    "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)".r
      .findAllIn(plan).length shouldBe 1
    val e = for {
      x <- (1L to 20L).map(i => (i, i % 3))
      y <- (1L to 30L).map(i => (i, i % 3)); if y._2 == x._2
    } yield (x._1, y._1)
    r.collect().sorted shouldBe e.sorted
  }

  it should "re-qualify a cross-file helper's sibling references at the splice site" in {
    val xs = DataBag((1L to 20L).map(i => (i, i % 3)))
    // matchingPool's body reads the bare sibling `pool`; the splice must
    // rewrite it to CrossFileLibX's static path (and resolve the implicit
    // SparkSession here), then derive the join
    val r = onSpark {
      for { x <- xs; y <- CrossFileLibX.matchingPool(x) } yield (x._1, y._1)
    }
    val plan = r.toDF.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    plan should not include regex("(?i)cartesian")
    val e = for {
      x <- (1L to 20L).map(i => (i, i % 3))
      y <- (1L to 30L).map(i => (i, i % 3)); if y._2 == x._2
    } yield (x._1, y._1)
    r.collect().sorted shouldBe e.sorted
    // and in a GUARD position (correlated fold over the cross-file bag)
    val ys = DataBag((1L to 30L).map(i => (i, i % 3)))
    val g = onSpark {
      for { x <- xs; if CrossFileLibX.matching(x, ys).size > 9L }
        yield x._1
    }
    val expG = (1L to 20L).map(i => (i, i % 3))
      .filter(x => (1L to 30L).map(i => (i, i % 3)).count(_._2 == x._2) > 9)
      .map(_._1)
    g.collect().sorted shouldBe expG.sorted
  }

  it should "inline NESTED cross-file @lib calls and abort mutual recursion" in {
    val xs = DataBag((1L to 20L).map(i => (i, i % 3)))
    val ys = DataBag((1L to 30L).map(i => (i, i % 3)))
    val r = onSpark {
      for { x <- xs; y <- CrossFileLibX.matchingAbove(x, 5L, ys) } yield (x._1, y._1)
    }
    val e = for {
      x <- (1L to 20L).map(i => (i, i % 3))
      y <- (1L to 30L).map(i => (i, i % 3)); if y._2 == x._2 && y._1 > 5L
    } yield (x._1, y._1)
    r.collect().sorted shouldBe e.sorted
    // the ping/pong pair cycles — compile-time abort, never a hang
    """
    val xs = graft.api.DataBag(Seq((1L, 1L)))
    val ys = graft.api.DataBag(Seq((1L, 1L)))
    graft.api.comprehensions.onSpark {
      for { x <- xs; y <- graft.api.CrossFileLibX.ping(x, ys) } yield (x._1, y._1)
    }
    """ shouldNot compile
  }

  it should "consume a @lib def compiled in a SEPARATE run (pickled source)" in {
    // graft.lib.QuotedLib lives in MAIN sources (compiled before the test
    // run); its @graftSrc annotation must be readable from the pickle and
    // its sibling `bigFloor` must re-qualify here
    val custs = DataBag(Seq(
      graft.CustRow(1L, "a", 0.0), graft.CustRow(2L, "b", 0.0)))
    val orders = DataBag(Seq(
      graft.OrderRow(10L, 1L, 200000.0), graft.OrderRow(11L, 1L, 100.0),
      graft.OrderRow(12L, 2L, 151000.0), graft.OrderRow(13L, 3L, 500000.0)))
    val r = onSpark {
      for { cu <- custs; o <- graft.lib.QuotedLib.bigOrdersOf(cu, orders) }
        yield (cu.c_custkey, o.o_orderkey)
    }
    val plan = r.toDF.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    plan should not include regex("(?i)cartesian")
    r.collect().sorted shouldBe Seq((1L, 10L), (2L, 12L))
  }

  it should "monomorphize GENERIC cross-file @lib defs from the typed call's type args" in {
    // the reference contract: Lib.expand inlines type-parameterized defs
    // (emma-lib kfold.split[A: Meta], transitiveClosure.apply[V: Meta]) —
    // here A is INFERRED (Long) at the call and substituted at the splice
    val xs = DataBag((1L to 20L).map(i => (i, i % 3)))
    val ys = DataBag((1L to 30L).map(i => (i, i % 3)))
    val r = onSpark {
      for { x <- xs; y <- CrossFileLibX.matchingGen(x._2, ys) } yield (x._1, y._1)
    }
    val plan = r.toDF.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    plan should not include regex("(?i)cartesian")
    "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)".r
      .findAllIn(plan).length shouldBe 1
    val e = for {
      x <- (1L to 20L).map(i => (i, i % 3))
      y <- (1L to 30L).map(i => (i, i % 3)); if y._1 == x._2
    } yield (x._1, y._1)
    r.collect().sorted shouldBe e.sorted
    // GUARD position with EXPLICIT type args (untyped positions cannot
    // recover inferred ones — the abort below pins that guidance)
    val g = onSpark {
      for { x <- xs; if CrossFileLibX.matchingGen[Long](x._2, ys).size > 9L }
        yield x._1
    }
    val expG = (1L to 20L).map(i => (i, i % 3))
      .filter(x => (1L to 30L).map(i => (i, i % 3)).count(_._1 == x._2) > 9)
      .map(_._1)
    g.collect().sorted shouldBe expG.sorted
    // TUPLE type argument: A = (String, Long) renders as tuple-type syntax
    // and must re-resolve =:= at the splice
    val pairsT = DataBag((1L to 30L).map(i => (i % 7, ("v" + i, i))))
    val rt = onSpark {
      for { x <- xs; p <- CrossFileLibX.matchingGen(x._2, pairsT) }
        yield (x._1, p._2._2)
    }
    val et = for {
      x <- (1L to 20L).map(i => (i, i % 3))
      i <- 1L to 30L; if i % 7 == x._2
    } yield (x._1, i)
    rt.collect().sorted shouldBe et.sorted
    // TWO tparams, the second bound only through a parameter's type
    val xp2 = DataBag((1L to 20L).map(i => (i % 5, "k" + i)))
    val ys2 = DataBag((1L to 30L).map(i => (i % 5, i)))
    val r2 = onSpark {
      for { x <- xp2; y <- CrossFileLibX.matching2(x, ys2) } yield (x._2, y._2)
    }
    val e2 = for {
      x <- (1L to 20L).map(i => (i % 5, "k" + i))
      y <- (1L to 30L).map(i => (i % 5, i)); if y._1 == x._1
    } yield (x._2, y._2)
    r2.collect().sorted shouldBe e2.sorted
    // guard position WITHOUT explicit type args: abort with guidance
    """
    implicit val sp: org.apache.spark.sql.SparkSession = null
    import sp.implicits._
    val xs = graft.api.DataBag(Seq((1L, 1L)))
    val ys = graft.api.DataBag(Seq((1L, 1L)))
    graft.api.comprehensions.onSpark {
      for { x <- xs; if graft.api.CrossFileLibX.matchingGen(x._2, ys).size > 0L }
        yield x._1
    }
    """ shouldNot compile
    // higher-kinded tparam: no monomorphization target — abort
    """
    implicit val sp: org.apache.spark.sql.SparkSession = null
    import sp.implicits._
    val xs = graft.api.DataBag(Seq((1L, 1L)))
    val ys = graft.api.DataBag(Seq((1L, 1L)))
    graft.api.comprehensions.onSpark {
      for { x <- xs; y <- graft.api.CrossFileLibX.higherKinded[Option](ys) }
        yield (x._1, y._1)
    }
    """ shouldNot compile
    // body-shadowed tparam: blind substitution would capture — abort
    """
    implicit val sp: org.apache.spark.sql.SparkSession = null
    import sp.implicits._
    val xs = graft.api.DataBag(Seq((1L, 1L)))
    val ys = graft.api.DataBag(Seq((1L, 1L)))
    graft.api.comprehensions.onSpark {
      for { x <- xs; y <- graft.api.CrossFileLibX.shadowedTparam(x._2, ys) }
        yield (x._1, y._1)
    }
    """ shouldNot compile
  }

  it should "consume a GENERIC @lib def compiled in a SEPARATE run (q250 contract)" in {
    // graft.lib.QuotedLib.keyedOver[A] lives in MAIN sources — the pickled
    // source re-parses here, A monomorphizes to String from the inferred
    // type args, and the evidence encoder re-resolves in this scope
    val ks = DataBag((1L to 6L).toSeq)
    val pairs = DataBag((1L to 30L).map(i => (i % 7, "v" + i)))
    val r = onSpark {
      for { k <- ks; p <- graft.lib.QuotedLib.keyedOver(k, pairs) }
        yield (k, p._2)
    }
    val plan = r.toDF.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    plan should not include regex("(?i)cartesian")
    val e = for { k <- 1L to 6L; i <- 1L to 30L; if i % 7 == k } yield (k, "v" + i)
    r.collect().sorted shouldBe e.sorted
  }

  it should "capture only imports whose scope encloses and precedes the @lib def" in {
    // ScopedLib.viaFoo's body reads bare `foo` — package-level foo (30-row
    // pool) at its definition site. SiblingScope's `import decoy.foo` is in
    // a NON-enclosing scope: under the r12 position-blind capture it was
    // recorded and OUTRANKED the package member, silently re-binding the
    // splice to decoy's 1-row bag. The splice must see the package member.
    val xs = DataBag((1L to 20L).map(i => (i, i % 3)))
    val r = onSpark {
      for { x <- xs; y <- ScopedLib.viaFoo(x) } yield (x._1, y._1)
    }
    val e = for {
      x <- (1L to 20L).map(i => (i, i % 3))
      y <- (1L to 30L).map(i => (i, i % 3)); if y._2 == x._2
    } yield (x._1, y._1)
    r.collect().sorted shouldBe e.sorted
    // the decoy fixture itself stays live (1-row bag)
    SiblingScope.touch shouldBe 1L
    // cross-OBJECT @lib nesting: viaOther's body calls CrossFileLibX's
    // @lib `matching` — the object name qualifies through the own-package
    // probe and the inner call splices recursively
    val ys = DataBag((1L to 30L).map(i => (i, i % 3)))
    val rx = onSpark {
      for { x <- xs; y <- CrossObjectLib.viaOther(x, ys) } yield (x._1, y._1)
    }
    val ex = for {
      x <- (1L to 20L).map(i => (i, i % 3))
      y <- (1L to 30L).map(i => (i, i % 3)); if y._2 == x._2 && y._1 > 2L
    } yield (x._1, y._1)
    rx.collect().sorted shouldBe ex.sorted
    // when the decoy import DOES enclose and precede the def, the free name
    // resolves both through the import and as a package member — ambiguous
    // from a foreign splice site (same-unit declaration order decides and
    // does not travel): abort, never pick either
    """
    implicit val sp: org.apache.spark.sql.SparkSession = null
    import sp.implicits._
    val xs = graft.api.DataBag(Seq((1L, 1L)))
    graft.api.comprehensions.onSpark {
      for { x <- xs; y <- graft.api.AmbiguousLib.viaAmbiguousFoo(x) } yield (x._1, y._1)
    }
    """ shouldNot compile
  }

  it should "accept object-level @lib and consume two members of one object cross-file" in {
    // the reference's documented module spelling (@emma.lib object stat):
    // QuotedOps lives in MAIN sources with the object-level annotation; two
    // member defs splice in ONE quote (ordersOf over pricierCents), and the
    // scalar sibling `cents` re-qualifies to the owner's static path
    val custs = DataBag(Seq(
      graft.CustRow(1L, "a", 0.0), graft.CustRow(2L, "b", 0.0)))
    val orders = DataBag(Seq(
      graft.OrderRow(10L, 1L, 200000.0), graft.OrderRow(11L, 1L, 100.0),
      graft.OrderRow(12L, 2L, 151000.0), graft.OrderRow(13L, 3L, 500000.0)))
    val r = onSpark {
      for { cu <- custs
            o <- graft.lib.QuotedOps.ordersOf(cu,
              graft.lib.QuotedOps.pricierCents(15000000L, orders)) }
        yield (cu.c_custkey, o.o_orderkey)
    }
    val plan = r.toDF.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    plan should not include regex("(?i)cartesian")
    r.collect().sorted shouldBe Seq((1L, 10L), (2L, 12L))
    // the scalar member carries NO @graftSrc (declared non-bag type) and
    // stays a plain static method
    graft.lib.QuotedOps.cents(1.23) shouldBe 123L
    // GENERIC member of the object-level module: the object walk and
    // splice-site monomorphization compose (A = String inferred)
    val ks = DataBag((1L to 6L).toSeq)
    val pairs = DataBag((1L to 30L).map(i => (i % 7, "v" + i)))
    val rg = onSpark {
      for { k <- ks; p <- graft.lib.QuotedOps.keyedVals(k, pairs) }
        yield (k, p._2)
    }
    val eg = for { k <- 1L to 6L; i <- 1L to 30L; if i % 7 == k } yield (k, "v" + i)
    rg.collect().sorted shouldBe eg.sorted
  }

  it should "substitute swapped same-named arguments SIMULTANEOUSLY (no sequential capture)" in {
    val xs = DataBag((1L to 20L).map(i => (i, i % 3)))
    val ys = DataBag((1L to 30L).map(i => (i, i % 3)))
    def band(x: (Long, Long), lo: Long, hi: Long): DataBag[(Long, Long)] =
      for { y <- ys; if y._2 == x._2 && y._1 >= lo && y._1 <= hi } yield y
    val lo = 20L
    val hi = 5L
    // the expression passed FOR parameter `lo` is the call-site ident `hi`
    // (and vice versa): a sequential per-parameter substitution would
    // rewrite the injected `hi` ident with the later hi-substitution,
    // making BOTH bounds read the call-site `lo` (y == 20 only) — the
    // two-phase fresh-rename substitution must behave simultaneously
    val r = onSpark { for { x <- xs; y <- band(x, hi, lo) } yield (x._1, y._1) }
    val e = for {
      x <- (1L to 20L).map(i => (i, i % 3))
      y <- (1L to 30L).map(i => (i, i % 3))
      if y._2 == x._2 && y._1 >= 5L && y._1 <= 20L
    } yield (x._1, y._1)
    r.collect().sorted shouldBe e.sorted
  }

  it should "abort when an inlined helper's external local collides with a splice-site binder" in {
    // the helper body's free reference `x` (an enclosing-scope local)
    // survives untypecheck as a bare Ident; at the splice site a generator
    // binder of the same name would capture it silently — the inliner must
    // abort instead (poison-and-decline discipline)
    """
    val ys = bagL(1L to 30L)
    val x = 3L
    def near(k: Long): graft.api.DataBag[Long] =
      for { y <- ys; if y % 7L == k % 7L && y > x } yield y
    val xs = bagL(1L to 10L)
    graft.api.comprehensions.onSpark { for { x <- xs; y <- near(x) } yield (x, y) }
    """ shouldNot compile
    // same helper, no name collision: inlines and derives
    val ys = bagL(1L to 30L)
    val lim = 3L
    def near(k: Long): DataBag[Long] =
      for { y <- ys; if y % 7L == k % 7L && y > lim } yield y
    val xs = bagL(1L to 10L)
    val r = onSpark { for { x <- xs; y <- near(x) } yield (x, y) }
    val e = for { x <- 1L to 10L; y <- 1L to 30L; if y % 7L == x % 7L && y > 3L }
      yield (x, y)
    r.collect().sorted shouldBe e.sorted
  }

  it should "pin duplicate-evaluation semantics for inlined helper arguments" in {
    // beta reduction substitutes the argument EXPRESSION per occurrence:
    // evaluation moves from call-time to use-time (same purity premise as
    // guard reordering / fold hoisting; the reference's expansion shares
    // the caveat) — an effectful argument observably runs MORE than once
    // per call. Documented in MIGRATION.md.
    EffCount.n.set(0L)
    val ys = bagL(1L to 12L)
    def around(x: Long, p: Long): DataBag[Long] =
      for { y <- ys; if y == x + p || y == x + p + 1L } yield y
    val xs = bagL(1L to 10L)
    val r = onSpark { for { x <- xs; y <- around(x, EffCount.tick()) } yield (x, y) }
    val e = for { x <- 1L to 10L; y <- 1L to 12L; if y == x || y == x + 1L }
      yield (x, y)
    r.collect().sorted shouldBe e.sorted
    // call-by-value (the reference-style fresh-val binding) would tick
    // exactly |xs| times at most; duplicate-evaluation ticks per USE
    EffCount.n.get() should be > 10L
  }

  it should "abort on mutable member WRITES inside quoted comprehensions" in {
    // a pure write (no read on the rhs) through `this`: executor-side
    // mutation never propagates back — must abort, not silently compile
    """
    class W1 {
      var total = 0L
      def run(xs: graft.api.DataBag[Long]) =
        graft.api.comprehensions.onSpark {
          for { x <- xs; if { this.total = x; x > 0L } } yield x
        }
    }
    """ shouldNot compile
    // object-field write in the YIELD
    """
    object Acc { var n = 0L }
    class W2 {
      def run(xs: graft.api.DataBag[Long]) =
        graft.api.comprehensions.onSpark {
          for { x <- xs } yield { Acc.n = x; x * 2L }
        }
    }
    """ shouldNot compile
    // compound assignment `obj.field += 1` (setter + getter spelling)
    """
    object Acc3 { var n = 0L }
    class W3 {
      def run(xs: graft.api.DataBag[Long]) =
        graft.api.comprehensions.onSpark {
          for { x <- xs } yield { Acc3.n += 1L; x }
        }
    }
    """ shouldNot compile
  }

  it should "run quoted DO-WHILE loops and IF-assigned bags (DSCF residue shapes)" in {
    // do-while reassigning a bag var, loop var captured in the guard: the
    // same per-chain var snapshot the sieve's while loop gets
    val r1 = onSpark {
      var xs = DataBag((1L to 64L).toSeq)
      var p = 1L
      do {
        xs = for { x <- xs; if x % (p + 1L) == 0L } yield x
        p += 1L
      } while (p < 3L)
      xs
    }
    val e1 = {
      var xs: Seq[Long] = 1L to 64L
      var p = 1L
      do { xs = xs.filter(_ % (p + 1L) == 0L); p += 1L } while (p < 3L)
      xs
    }
    r1.collect().sorted shouldBe e1.sorted
    // nested IF assigning a bag var across branches (statement position),
    // then a comprehension over the assigned var
    val a = bagL(1L to 10L)
    val b = bagL(5L to 15L)
    def pick(flag: Boolean): DataBag[Long] = {
      var out = a
      if (flag) out = onSpark { for { x <- a; if x > 3L } yield x }
      else out = onSpark { for { x <- b; if x < 10L } yield x }
      out
    }
    pick(true).collect().sorted shouldBe (4L to 10L)
    pick(false).collect().sorted shouldBe (5L to 9L)
    // the SAME branches quoted as one expression-position if INSIDE the
    // quote, joined downstream against another bag
    def quotedPick(flag: Boolean): DataBag[(Long, Long)] = onSpark {
      val out = if (flag) (for { x <- a; if x > 3L } yield x)
                else (for { x <- b; if x < 10L } yield x)
      for { x <- out; y <- a; if x == y } yield (x, y)
    }
    quotedPick(true).collect().sorted shouldBe (4L to 10L).map(i => (i, i))
    quotedPick(false).collect().sorted shouldBe (5L to 9L).map(i => (i, i))
    // if/else-assigned bag var INSIDE the quote (statement position),
    // consumed by a later chain in the same quoted block
    val r4 = onSpark {
      var out = a
      var lim = 7L
      if (lim > 5L) out = (for { x <- a; if x > lim } yield x)
      else out = (for { x <- b; if x < lim } yield x)
      lim = 0L // must not matter: chains snapshot captured vars at build
      for { x <- out } yield x * 2L
    }
    r4.collect().sorted shouldBe Seq(16L, 18L, 20L)
  }

  it should "unnest DEPTH-3 dependent comprehension chains to a 3-way join plan" in {
    val as = DataBag((1L to 20L).map(i => (i, i % 5)))
    val bs = DataBag((1L to 30L).map(i => (i, i % 5, i % 3)))
    val cs = DataBag((1L to 40L).map(i => (i, i % 3)))
    val r = onSpark {
      for {
        a <- as
        v <- (for {
          b <- bs
          if b._2 == a._2
          w <- (for { c <- cs; if c._2 == b._3 } yield c._1 + b._1)
        } yield w + a._1)
      } yield (a._1, v)
    }
    // the splice recurses level by level (ref Normalize.scala:44-52 runs
    // to fixpoint): both correlations key equi joins, nothing crosses
    val plan = r.toDF.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    plan should not include regex("(?i)cartesian")
    plan should not include regex("(?i)BroadcastNestedLoop")
    "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)".r
      .findAllIn(plan).length shouldBe 2
    val exp = for {
      a <- (1L to 20L).map(i => (i, i % 5))
      b <- (1L to 30L).map(i => (i, i % 5, i % 3)); if b._2 == a._2
      c <- (1L to 40L).map(i => (i, i % 3)); if c._2 == b._3
    } yield (a._1, (c._1 + b._1) + a._1)
    r.collect().sorted shouldBe exp.sorted
  }

  it should "still abort depth-3 shapes whose INNERMOST level is underivable" in {
    // the innermost generator is a METHOD-built bag depending on the
    // middle binder — not a spliceable chain, not a literal ctor: after
    // the outer splice re-expands, the dependent-generator abort stands
    // (the one-job-per-element cliff), instead of degrading silently
    """
    val xs = bagL(1L to 5L)
    val ys = bagL(1L to 5L)
    def f(y: Long): DataBag[Long] = bagL(Seq(y, y + 1))
    onSpark { for {
      x <- xs
      v <- (for { y <- ys; if y == x; w <- f(y) } yield w)
    } yield (x, v) }
    """ shouldNot compile
    // an INEQUALITY correlation at the innermost level, by contrast, is
    // NOT an abort: it demotes to the documented cross + post-filter —
    // same rule as the top-level inseparable-guard case
    val xs = bagL(1L to 6L)
    val ys = bagL(1L to 5L)
    val zs = bagL(1L to 4L)
    val r = onSpark {
      for {
        x <- xs
        v <- (for { y <- ys; if y == x
          w <- (for { z <- zs; if z < y } yield z) } yield w)
      } yield (x, v)
    }
    val exp = for { x <- 1L to 6L; y <- 1L to 5L; if y == x
      z <- 1L to 4L; if z < y } yield (x, z)
    r.collect().sorted shouldBe exp.sorted
  }

  it should "derive comprehensions assembled in BLOCK statements (deep default-case pass)" in {
    val xs = bagL(1L to 15L)
    val ys = bagL(1L to 12L)
    val (u, n) = onSpark {
      val a = for { x <- xs; y <- ys; if x % 4 == y % 4 } yield x + y
      val b = for { x <- xs; y <- ys; if x % 3 == y % 3 } yield x * y
      (a union b, a.size)
    }
    val ea = for { x <- 1L to 15L; y <- 1L to 12L; if x % 4 == y % 4 } yield x + y
    val eb = for { x <- 1L to 15L; y <- 1L to 12L; if x % 3 == y % 3 } yield x * y
    val plan = u.toDF.queryExecution.executedPlan.toString
    plan should not include regex("(?i)cartesian")
    u.collect().sorted shouldBe (ea ++ eb).sorted
    n shouldBe ea.size.toLong
  }
}
