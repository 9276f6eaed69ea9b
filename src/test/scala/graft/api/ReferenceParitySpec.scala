package graft.api

import org.apache.spark.sql.SparkSession
import org.scalatest.freespec.AnyFreeSpec
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.api.comprehensions.onSpark

/** The reference's own differential corpus, re-run against this engine.
  *
  * `BaseCodegenIntegrationSpec.scala:105-615` (emma-language test suite) is
  * the reference's operational definition of "same capabilities": ~46 quoted
  * programs covering Filter / Map / FlatMap / Distinct / Union / Join /
  * Cross / Group / FoldGroup / Fold / MutableBag / Normalization / CSV /
  * Miscellaneous, each verified by running the compiled pipeline against
  * the identity pipeline on the same data. This spec ports every program:
  * the quoted body goes through `comprehensions.onSpark` (this engine's
  * quotation front-end) and the result is compared against an independent
  * plain-Scala Seq evaluation of the same program — the same differential
  * the reference runs, with the roles Spark-plan vs driver-Seq.
  *
  * Input data is synthesized here (deterministic, same SHAPE as the
  * reference's lyrics/cinema/graph fixtures — text lines, movies with
  * title/year/rating, festival winners keyed (title, year), labelled
  * edges); the reference's resource files are not copied. Parity is a
  * property of the PROGRAMS, not the fixtures.
  *
  * Provenance: the quoted PROGRAMS are transcribed from the reference's
  * Apache-2.0 test suite deliberately — they ARE the parity contract
  * being verified (same stance as the adjudicated RanHash port); the
  * engine under test, the fixtures, and the expected-value evaluations
  * are original.
  *
  * Scorecard (per reference group; adaptation notes in each test):
  *
  *  | group          | programs | PASS | ABORT (by declared design stance) |
  *  |----------------|----------|------|-----------------------------------|
  *  | Filter         | 3        | 3    | —                                 |
  *  | Map            | 3        | 3    | — (exists-in-yield: local spelling;
  *  |                |          |      |   distributed-bag capture aborts,
  *  |                |          |      |   pinned)                         |
  *  | FlatMap        | 4        | 4    | —                                 |
  *  | Distinct       | 2        | 2    | —                                 |
  *  | Union          | 1        | 1    | —                                 |
  *  | Join           | 5        | 5    | —                                 |
  *  | Cross          | 1        | 1    | —                                 |
  *  | Group          | 2        | 2    | —                                 |
  *  | FoldGroup      | 6        | 6    | —                                 |
  *  | Fold           | 4        | 4    | —                                 |
  *  | MutableBag     | 2        | 2    | —                                 |
  *  | Normalization  | 5        | 5    | —                                 |
  *  | CSV            | 1        | 1    | —                                 |
  *  | Miscellaneous  | 8        | 8    | — (sieve runs VERBATIM: DSCF
  *  |                |          |      |   var-snapshot, see test)         |
  *  | TOTAL          | 47       | 47   | 0 wrong answers                   |
  *
  * Adaptations (all spelling, none semantic — documented per test):
  *  - group values are `Seq[A]` here (the materialized-group design
  *    stance), so the reference's `g.values.collect().sorted` is
  *    `g.values.sorted` and `g.values.size` is Int (`.toLong` where the
  *    program compares with a Long).
  *  - (the sieve runs VERBATIM: the macro snapshots loop vars captured in
  *    quoted lambdas at chain-build time — the same semantics the
  *    reference's DSCF pass produces by converting loop variables to
  *    function parameters, `lang/core/DSCF.scala`.)
  */
class ReferenceParitySpec extends AnyFreeSpec with Matchers {

  import ReferenceParitySpec._

  implicit lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  // --------------------------------------------------------------------
  // Filter  (ref BaseCodegenIntegrationSpec.scala:105-119)
  // --------------------------------------------------------------------

  "Filter" - {
    "strings" in {
      val act = onSpark { DataBag(lines) withFilter { _.length > 30 } }
      act.collect() should contain theSameElementsAs lines.filter(_.length > 30)
    }

    "tuples" in {
      val act = onSpark { DataBag(lines map { (_, 1) }) withFilter { _._1.length > 30 } }
      act.collect() should contain theSameElementsAs
        lines.map((_, 1)).filter(_._1.length > 30)
    }

    "case classes" in {
      val act = onSpark {
        DataBag(movies)
          .withFilter { _.year > 1980 }
          .withFilter { _.title.length > 10 }
      }
      act.collect() should contain theSameElementsAs
        movies.filter(_.year > 1980).filter(_.title.length > 10)
    }
  }

  // --------------------------------------------------------------------
  // Map  (ref :125-155)
  // --------------------------------------------------------------------

  "Map" - {
    // Ref :127-139 probes membership of x in three small bags inside the
    // yield. A DISTRIBUTED bag captured in a yield closure aborts here by
    // design (it would crash at runtime riding the executor closure) —
    // pinned below; the program itself PASSES with the bags held local
    // (they are literal 3-element collections), same results.
    "primitives" in {
      val act = onSpark {
        val us = Seq(1, 2, 3)
        val vs = Seq(4, 5, 6)
        val ws = Seq(7, 8, 9)
        for {
          x <- DataBag(2 to 20 by 2)
        } yield {
          if (us.exists(_ == x)) 9 * x
          else if (vs.exists(_ == x)) 5 * x
          else if (ws.exists(_ == x)) 1 * x
          else 0
        }
      }
      val exp = for (x <- 2 to 20 by 2) yield {
        if (Seq(1, 2, 3).exists(_ == x)) 9 * x
        else if (Seq(4, 5, 6).exists(_ == x)) 5 * x
        else if (Seq(7, 8, 9).exists(_ == x)) 1 * x
        else 0
      }
      act.collect() should contain theSameElementsAs exp
      // the distributed-bag-in-yield spelling of the same program aborts
      // at compile time (measured residue of the design stance):
      """
        import graft.api._, graft.api.comprehensions.onSpark
        def f(implicit s: org.apache.spark.sql.SparkSession) = {
          import s.implicits._
          val us = DataBag(Seq(1, 2, 3))
          onSpark { for { x <- DataBag(2 to 20 by 2) } yield if (us.exists(_ == x)) 9 * x else 0 }
        }
      """ shouldNot compile
    }

    "tuples" in {
      val act = onSpark {
        for { edge <- DataBag((1, 4, "A") :: (2, 5, "B") :: (3, 6, "C") :: Nil) }
          yield if (edge._1 < edge._2) edge._1 -> edge._2 else edge._2 -> edge._1
      }
      val exp = for { edge <- (1, 4, "A") :: (2, 5, "B") :: (3, 6, "C") :: Nil }
        yield if (edge._1 < edge._2) edge._1 -> edge._2 else edge._2 -> edge._1
      act.collect() should contain theSameElementsAs exp
    }

    "case classes" in {
      val act = onSpark {
        for { edge <- DataBag(graph) } yield
          if (edge.label == "B") LabelledEdge(edge.dst, edge.src, "B")
          else edge.copy(label = "Y")
      }
      val exp = for { edge <- graph } yield
        if (edge.label == "B") LabelledEdge(edge.dst, edge.src, "B")
        else edge.copy(label = "Y")
      act.collect() should contain theSameElementsAs exp
    }
  }

  // --------------------------------------------------------------------
  // FlatMap  (ref :161-196)
  // --------------------------------------------------------------------

  "FlatMap" - {
    "strings" in {
      val act = onSpark {
        DataBag(lines) flatMap { line =>
          DataBag(line split "\\W+" filter { word =>
            word.length > 3 && word.length < 9
          })
        }
      }
      val exp = lines.flatMap(_.split("\\W+").filter(w => w.length > 3 && w.length < 9))
      act.collect() should contain theSameElementsAs exp
    }

    "with filter" in {
      val act = onSpark {
        DataBag(lines) flatMap { line =>
          DataBag(line split "\\W+" filter {
            word => word.length > 3 && word.length < 9
          })
        } withFilter { _.length > 5 }
      }
      val exp = lines
        .flatMap(_.split("\\W+").filter(w => w.length > 3 && w.length < 9))
        .filter(_.length > 5)
      act.collect() should contain theSameElementsAs exp
    }

    "comprehension with uncorrelated result" in {
      val act = onSpark {
        for {
          line <- DataBag(lines)
          word <- DataBag(line split "\\W+" filter { word =>
            word.length > 3 && word.length < 9
          }) if word.length > 5
        } yield word
      }
      val exp = for {
        line <- lines
        word <- line.split("\\W+").filter(w => w.length > 3 && w.length < 9)
        if word.length > 5
      } yield word
      act.collect() should contain theSameElementsAs exp
    }

    "comprehension with correlated result" in {
      val act = onSpark {
        for {
          line <- DataBag(lines)
          word <- DataBag(line split "\\W+")
        } yield (line, word)
      }
      val exp = for { line <- lines; word <- line.split("\\W+") } yield (line, word)
      act.collect() should contain theSameElementsAs exp
    }
  }

  // --------------------------------------------------------------------
  // Distinct and Union  (ref :203-217)
  // --------------------------------------------------------------------

  "Distinct" - {
    "strings" in {
      val act = onSpark { DataBag(lines flatMap { _ split "\\W+" }).distinct }
      act.collect() should contain theSameElementsAs
        lines.flatMap(_.split("\\W+")).distinct
    }

    "tuples" in {
      val act = onSpark { DataBag(lines.flatMap { _ split "\\W+" } map { (_, 1) }).distinct }
      act.collect() should contain theSameElementsAs
        lines.flatMap(_.split("\\W+")).map((_, 1)).distinct
    }
  }

  "Union" in {
    val act = onSpark { DataBag(wordsEven) union DataBag(wordsOdd) }
    act.collect() should contain theSameElementsAs (wordsEven ++ wordsOdd)
  }

  // --------------------------------------------------------------------
  // Join & Cross  (ref :223-291)
  // --------------------------------------------------------------------

  "Join" - {
    "two-way on primitives" in {
      val act = onSpark {
        for {
          x <- DataBag(1 to 50)
          y <- DataBag(1 to 100)
          if x == 2 * y
        } yield (x, 2 * y, 2)
      }
      val exp = for { x <- 1 to 50; y <- 1 to 100; if x == 2 * y } yield (x, 2 * y, 2)
      act.collect() should contain theSameElementsAs exp
      assertJoins(act.toDF.queryExecution.executedPlan.toString, 1)
    }

    "two-way on tuples" in {
      val act = onSpark {
        for {
          x <- DataBag((5 to 15).zipWithIndex)
          y <- DataBag((1 to 20).zipWithIndex)
          if x._1 == y._1
        } yield (x, y)
      }
      val exp = for {
        x <- (5 to 15).zipWithIndex
        y <- (1 to 20).zipWithIndex
        if x._1 == y._1
      } yield (x, y)
      act.collect() should contain theSameElementsAs exp
      assertJoins(act.toDF.queryExecution.executedPlan.toString, 1)
    }

    // Q: how many cannes winners are there in the top-rated list?
    "two-way on case classes" in {
      val act = onSpark {
        val cannesTop = for {
          movie <- DataBag(movies)
          winner <- DataBag(cannes)
          if (movie.title, movie.year) == (winner.title, winner.year)
        } yield ("Cannes", movie.year, winner.title)

        val berlinTop = for {
          movie <- DataBag(movies)
          winner <- DataBag(berlin)
          if (movie.title, movie.year) == (winner.title, winner.year)
        } yield ("Berlin", movie.year, winner.title)

        berlinTop union cannesTop
      }
      val expC = for {
        m <- movies; w <- cannes; if (m.title, m.year) == (w.title, w.year)
      } yield ("Cannes", m.year, w.title)
      val expB = for {
        m <- movies; w <- berlin; if (m.title, m.year) == (w.title, w.year)
      } yield ("Berlin", m.year, w.title)
      act.collect() should contain theSameElementsAs (expB ++ expC)
      assertNoCartesian(act.toDF.queryExecution.executedPlan.toString)
    }

    "multi-way on primitives" in {
      val act = onSpark {
        for {
          x <- DataBag(1 to 10)
          y <- DataBag(1 to 20)
          z <- DataBag(1 to 100)
          if x * x + y * y == z * z
        } yield (x, y, z)
      }
      val exp = for {
        x <- 1 to 10; y <- 1 to 20; z <- 1 to 100
        if x * x + y * y == z * z
      } yield (x, y, z)
      act.collect() should contain theSameElementsAs exp
      // x-y combine by cross (no guard relates them — 10x20 rows, the
      // genuine product); the z generator keys an equi join on
      // x*x+y*y == z*z, so there is NO all-pairs against the large z side
      assertJoins(act.toDF.queryExecution.executedPlan.toString, 1, allowCross = true)
    }

    "multi-way on case classes with local input" in {
      val act = onSpark {
        val cannesTop = for {
          movie <- DataBag(movies)
          winner <- DataBag(cannes)
          if (winner.title, winner.year) == (movie.title, movie.year)
        } yield (movie.year, winner.title)

        val berlinTop = for {
          movie <- DataBag(movies)
          winner <- DataBag(berlin)
          if (winner.title, winner.year) == (movie.title, movie.year)
        } yield (movie.year, winner.title)

        cannesTop union berlinTop
      }
      val expC = for {
        m <- movies; w <- cannes; if (w.title, w.year) == (m.title, m.year)
      } yield (m.year, w.title)
      val expB = for {
        m <- movies; w <- berlin; if (w.title, w.year) == (m.title, m.year)
      } yield (m.year, w.title)
      act.collect() should contain theSameElementsAs (expC ++ expB)
      assertNoCartesian(act.toDF.queryExecution.executedPlan.toString)
    }
  }

  "Cross" in {
    val act = onSpark {
      for {
        x <- DataBag(3 to 100 by 3)
        y <- DataBag(5 to 100 by 5)
      } yield x * y
    }
    val exp = for { x <- 3 to 100 by 3; y <- 5 to 100 by 5 } yield x * y
    act.collect() should contain theSameElementsAs exp
  }

  // --------------------------------------------------------------------
  // Group (with materialization) and FoldGroup (aggregations)
  // (ref :298-372)
  // --------------------------------------------------------------------

  "Group" - {
    "materialization" in {
      val act = onSpark { DataBag(Seq(1)) groupBy Predef.identity }
      act.collect() shouldBe Seq(Group(1, Seq(1)))
    }

    // ref :303-310 shuffles with an unseeded Random; seeded here so the
    // driver-Seq twin sees the same input order (the RESULT is
    // shuffle-invariant either way: per-group sorted-take-sum, then max)
    "materialization with closure" in {
      val act = onSpark {
        val semiFinal = 8
        val bag = DataBag(new scala.util.Random(42) shuffle 0.until(100).toList)
        val top = for (g <- bag groupBy { _ % semiFinal })
          yield g.values.sorted.take(semiFinal / 2).sum
        top.max
      }
      val exp = new scala.util.Random(42).shuffle(0.until(100).toList)
        .groupBy(_ % 8).values.map(_.sorted.take(4).sum).max
      act shouldBe exp
    }
  }

  "FoldGroup" - {
    "of primitives" in {
      val act = onSpark {
        for (g <- DataBag(1 to 100 map { _ -> 0 }) groupBy { _._1 })
          yield g.values.map { _._2 }.sum
      }
      val exp = (1 to 100).map(_ -> 0).groupBy(_._1).values.map(_.map(_._2).sum).toSeq
      act.collect() should contain theSameElementsAs exp
    }

    "of case classes" in {
      val act = onSpark {
        for (yearly <- DataBag(movies) groupBy { _.year })
          yield yearly.values.size
      }
      val exp = movies.groupBy(_.year).values.map(_.size).toSeq
      act.collect() should contain theSameElementsAs exp
    }

    "of case classes multiple times" in {
      val act = onSpark {
        val ms = DataBag(movies)
        for (decade <- ms groupBy { _.year / 10 }) yield {
          val values = decade.values
          val total = values.size
          val avgRating = values.map { _.rating.toInt * 10 }.sum / (total * 10.0)
          val minRating = values.map { _.rating }.min
          val maxRating = values.map { _.rating }.max
          (s"${decade.key * 10} - ${decade.key * 10 + 9}",
            total, avgRating, minRating, maxRating)
        }
      }
      val exp = movies.groupBy(_.year / 10).map { case (dec, vs) =>
        (s"${dec * 10} - ${dec * 10 + 9}", vs.size,
          vs.map(_.rating.toInt * 10).sum / (vs.size * 10.0),
          vs.map(_.rating).min, vs.map(_.rating).max)
      }.toSeq
      act.collect() should contain theSameElementsAs exp
    }

    "with a complex key" in {
      val act = onSpark {
        val yearlyRatings = DataBag(movies)
          .groupBy { movie => (movie.year / 10, movie.rating.toInt) }
        for (yr <- yearlyRatings) yield {
          val (year, rating) = yr.key
          (year, rating, yr.values.size)
        }
      }
      val exp = movies.groupBy(m => (m.year / 10, m.rating.toInt))
        .map { case ((y, r), vs) => (y, r, vs.size) }.toSeq
      act.collect() should contain theSameElementsAs exp
    }

    "with duplicate group names" in {
      val (actLeast, actMost) = onSpark {
        val ms = DataBag(movies)
        val leastPopular = for {
          Group(decade, dmovies) <- ms groupBy { _.year / 10 }
        } yield (decade, dmovies.size, dmovies.map { _.rating }.min)
        val mostPopular = for {
          Group(decade, dmovies) <- ms groupBy { _.year / 10 }
        } yield (decade, dmovies.size, dmovies.map { _.rating }.max)
        (leastPopular, mostPopular)
      }
      val grouped = movies.groupBy(_.year / 10)
      actLeast.collect() should contain theSameElementsAs
        grouped.map { case (d, vs) => (d, vs.size, vs.map(_.rating).min) }.toSeq
      actMost.collect() should contain theSameElementsAs
        grouped.map { case (d, vs) => (d, vs.size, vs.map(_.rating).max) }.toSeq
    }

    "with multiple groups in the same comprehension" in {
      val act = onSpark {
        for {
          can10 <- DataBag(cannes) groupBy { _.year / 10 }
          ber10 <- DataBag(berlin) groupBy { _.year / 10 }
          if can10.key == ber10.key
        } yield (can10.values.size, ber10.values.size)
      }
      val cg = cannes.groupBy(_.year / 10)
      val bg = berlin.groupBy(_.year / 10)
      val exp = for { (ck, cv) <- cg.toSeq; (bk, bv) <- bg.toSeq; if ck == bk }
        yield (cv.size, bv.size)
      act.collect() should contain theSameElementsAs exp
    }
  }

  // --------------------------------------------------------------------
  // Fold (global aggregations)  (ref :378-394)
  // --------------------------------------------------------------------

  "Fold" - {
    // ref :379-381 comments the body out; the stated intent runs here
    "of an empty DataBag (nonEmpty)" in {
      val act = onSpark {
        (DataBag.empty[Int].nonEmpty, DataBag(Seq(1, 2, 3)).nonEmpty)
      }
      act shouldBe ((false, true))
    }

    "of primitives (fold)" in {
      val act = onSpark { DataBag(0 until 100).fold(0)(Predef.identity, _ + _) }
      act shouldBe (0 until 100).sum
    }

    "of primitives (sum)" in {
      val act = onSpark { DataBag(1 to 200).sum }
      act shouldBe (1 to 200).sum
    }

    "of case classes (count)" in {
      val act = onSpark { DataBag(movies).size }
      act shouldBe movies.size.toLong
    }
  }

  // --------------------------------------------------------------------
  // MutableBag  (ref :400-457)
  // --------------------------------------------------------------------

  "MutableBag" - {
    "create and collect" in {
      val act = onSpark {
        MutableBag(DataBag((1 to 100).map(x => x -> x.toLong))).bag().collect()
      }
      val exp = (1 to 100).map(x => x -> x.toLong)
      exp should contain theSameElementsAs act
    }

    "update and copy" in {
      val exp1 = (1 to 10).map(x => x -> (if (x % 2 == 0) 2L * x else x))
      val exp3 = (1 to 10).map(x => x -> x.toLong)
      val exp6 = (1 to 10).map(x => x -> (if (x % 2 != 0) 2L * x else x))

      val act1 :: act2 :: act3 :: act4 :: act5 :: act6 :: Nil = onSpark {
        val inputs = DataBag((1 to 10).map(x => x -> x.toLong))
        val state1 = MutableBag(inputs)
        val state2 = state1
        val state3 = state1.copy()

        state1.update(
          inputs.withFilter(_._1 % 2 == 0).groupBy(_._1)
        )((_, vOld, m) => vOld.map(_ + m.map(_._2).sum))

        val act1 = state1.bag().collect()
        val act2 = state2.bag().collect()
        val act3 = state3.bag().collect()

        state3.update(
          inputs.withFilter(_._1 % 2 != 0).groupBy(_._1)
        )((_, vOld, m) => vOld.map(_ + m.map(_._2).sum))

        val act4 = state1.bag().collect()
        val act5 = state2.bag().collect()
        val act6 = state3.bag().collect()

        act1 :: act2 :: act3 :: act4 :: act5 :: act6 :: Nil
      }

      act1 should contain theSameElementsAs exp1
      act2 should contain theSameElementsAs exp1
      act3 should contain theSameElementsAs exp3
      act4 should contain theSameElementsAs exp1
      act5 should contain theSameElementsAs exp1
      act6 should contain theSameElementsAs exp6
    }
  }

  // --------------------------------------------------------------------
  // Expression normalization  (ref :463-501)
  // --------------------------------------------------------------------

  "Normalization" - {
    "of filters with simple predicates" in {
      val act = onSpark {
        for {
          x <- DataBag(1 to 1000)
          if !(x > 5 || (x < 2 && x == 0)) || (x > 5 || !(x < 2))
        } yield x
      }
      val exp = for {
        x <- 1 to 1000
        if !(x > 5 || (x < 2 && x == 0)) || (x > 5 || !(x < 2))
      } yield x
      act.collect() should contain theSameElementsAs exp
    }

    "of filters with simple predicates and multiple inputs" in {
      val act = onSpark {
        for {
          x <- DataBag(1 to 1000)
          y <- DataBag(100 to 200)
          if x < y || x + y < 100 && x % 2 == 0 || y / 2 == 0
        } yield y + x
      }
      val exp = for {
        x <- 1 to 1000; y <- 100 to 200
        if x < y || x + y < 100 && x % 2 == 0 || y / 2 == 0
      } yield y + x
      act.collect() should contain theSameElementsAs exp
    }

    "of filters with UDF predicates" in {
      val act = onSpark {
        for {
          x <- DataBag(1 to 1000)
          if !(p1(x) || (p2(x) && p3(x))) || (p1(x) || !p2(x))
        } yield x
      }
      val exp = for {
        x <- 1 to 1000
        if !(p1(x) || (p2(x) && p3(x))) || (p1(x) || !p2(x))
      } yield x
      act.collect() should contain theSameElementsAs exp
    }

    "of names of case classes" in {
      val act = onSpark {
        val ms = DataBag(movies)
        val years = for (mov <- ms) yield MovieYear(mov.year)
        years forall { case iy @ MovieYear(yr) => iy == MovieYear(yr) }
      }
      act shouldBe true
    }

    "of local functions" in {
      val act = onSpark {
        val double = (x: Int) => 2 * x
        val add = (x: Int, y: Int) => x + y
        val times2 = for { x <- DataBag(1 to 100) } yield double(x)
        val increment5 = for { x <- DataBag(1 to 100) } yield add(x, 5)
        times2 union increment5
      }
      val exp = (1 to 100).map(2 * _) ++ (1 to 100).map(_ + 5)
      act.collect() should contain theSameElementsAs exp
    }
  }

  // --------------------------------------------------------------------
  // CSV IO  (ref :507-517)
  // --------------------------------------------------------------------

  "CSV" - {
    "read/write case classes" in {
      val base = java.nio.file.Files.createTempDirectory("parity_csv")
      val inputPath = s"$base/movies_in.csv"
      val outputPath = s"$base/movies_written.csv"
      DataBag(movies).writeCSV(inputPath, CSV())
      val act = onSpark {
        // Read it, write it, and then read it again
        val bag = DataBag.readCSV[Movie](inputPath, CSV())
        bag.writeCSV(outputPath, CSV())
        DataBag.readCSV[Movie](outputPath, CSV()).collect().sortBy(_.title)
      }
      act shouldBe movies.sortBy(_.title)
    }
  }

  // --------------------------------------------------------------------
  // Miscellaneous  (ref :523-615)
  // --------------------------------------------------------------------

  "Miscellaneous" - {
    "Pattern matching in yield" in {
      val act = onSpark {
        val range = DataBag((0 to 100).zipWithIndex)
        val squares = for (ij <- range) yield ij match { case (i, j) => i + j }
        squares.sum
      }
      act shouldBe (0 to 100).zipWithIndex.map { case (i, j) => i + j }.sum
    }

    "Map with partial function" in {
      val act = onSpark {
        val range = DataBag((0 to 100).zipWithIndex)
        val squares = range map { case (i, j) => i + j }
        squares.sum
      }
      act shouldBe (0 to 100).zipWithIndex.map { case (i, j) => i + j }.sum
    }

    "Destructuring of a generator" in {
      val act = onSpark {
        val range = DataBag((0 to 100).zipWithIndex)
        val squares = for { (x, y) <- range } yield x + y
        squares.sum
      }
      act shouldBe (0 to 100).zipWithIndex.map { case (x, y) => x + y }.sum
    }

    "Intermediate value definition" in {
      val act = onSpark {
        val range = DataBag((0 to 100).zipWithIndex)
        val squares = for (xy <- range; sqr = xy._1 * xy._2) yield sqr
        squares.sum
      }
      act shouldBe (0 to 100).zipWithIndex.map(xy => xy._1 * xy._2).sum
    }

    //noinspection ScalaUnusedSymbol
    "Root package capture" in {
      val act = onSpark {
        val eu = "eu"
        val com = "com"
        val java = "java"
        val org = "org"
        val scala = "scala"
        DataBag(0 to 100).sum
      }
      act shouldBe (0 to 100).sum
    }

    "Constant expressions" in {
      val act = onSpark {
        val as = for { _ <- DataBag(1 to 100) } yield 1 // map
        val bs = DataBag(101 to 200) flatMap { _ => DataBag(2 to 4) } // flatMap
        val cs = for { _ <- DataBag(201 to 300) if 5 == 1 } yield 5 // filter
        val ds = DataBag(301 to 400) withFilter { _ => true } // filter
        as union bs union cs union ds
      }
      val exp = (1 to 100).map(_ => 1) ++
        (101 to 200).flatMap(_ => 2 to 4) ++
        (201 to 300).filter(_ => 5 == 1).map(_ => 5) ++
        (301 to 400)
      act.collect() should contain theSameElementsAs exp
    }

    // ref :567-596 — the sieve's `while` loop, VERBATIM: the loop var `p`
    // is captured inside the quoted guards, and the macro applies the
    // reference's DSCF semantics automatically (each chain snapshots the
    // captured var at build time — lang/core/DSCF.scala converts loop
    // vars to function parameters; here the snapshot val is that
    // parameter), so no spelling adaptation is needed.
    "Updated tmp sink (sieve of Eratosthenes)" in {
      val act = onSpark {
        val N = 20
        val payload = "#" * 100

        val positive = {
          var primes = DataBag(3 to N map { (_, payload) })
          var p = 2

          while (p <= math.sqrt(N)) {
            primes = for { (n, payload) <- primes if n > p && n % p != 0 } yield (n, payload)
            p = primes.map { _._1 }.min
          }

          primes map { _._1 }
        }

        val negative = {
          var primes = DataBag(-N to 3 map { (_, payload) })
          var p = -2

          while (p >= -math.sqrt(N)) {
            primes = for { (n, payload) <- primes if n < p && n % p != 0 } yield (n, payload)
            p = primes.map { _._1 }.max
          }

          primes map { _._1 }
        }

        positive union negative
      }
      val expPos = {
        var primes: Seq[Int] = (3 to 20)
        var p = 2
        while (p <= math.sqrt(20)) {
          primes = primes.filter(n => n > p && n % p != 0)
          p = primes.min
        }
        primes
      }
      val expNeg = {
        var primes: Seq[Int] = (-20 to 3)
        var p = -2
        while (p >= -math.sqrt(20)) {
          primes = primes.filter(n => n < p && n % p != 0)
          p = primes.max
        }
        primes
      }
      act.collect() should contain theSameElementsAs (expPos ++ expNeg)
    }

    "val destructuring" in {
      val act = onSpark {
        val top = DataBag(movies)
        val ratingsPerDecade = for {
          group <- top.groupBy(mov => (mov.year / 10, mov.rating.round))
        } yield {
          val (year, rating) = group.key
          (year, rating, group.values.size.toLong)
        }
        for {
          r <- ratingsPerDecade
          m <- top
          if r == (m.year / 10, m.rating.round, 1L)
        } yield (r, m)
      }
      val rpd = movies.groupBy(m => (m.year / 10, m.rating.round))
        .map { case ((y, r), vs) => (y, r, vs.size.toLong) }.toSeq
      val exp = for { r <- rpd; m <- movies; if r == (m.year / 10, m.rating.round, 1L) }
        yield (r, m)
      act.collect() should contain theSameElementsAs exp
    }
  }

  // shared plan assertions -------------------------------------------------

  /** The executedPlan after AQE finalization repeats operators under its
    * "== Initial Plan ==" section — count in the final section only. */
  private def finalSection(plan: String): String =
    plan.split("== Initial Plan ==")(0)

  private def assertNoCartesian(plan: String): Unit = {
    val p = finalSection(plan)
    p should not include regex("(?i)cartesian")
    p should not include regex("(?i)BroadcastNestedLoop")
  }

  /** Exactly n equi joins in the final plan; allowCross admits the
    * genuine cross a guard-free generator pair lowers to. */
  private def assertJoins(plan: String, n: Int, allowCross: Boolean = false): Unit = {
    if (!allowCross) assertNoCartesian(plan)
    val joins = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)".r
      .findAllIn(finalSection(plan)).length
    joins shouldBe n
  }
}

/** Deterministic fixtures with the reference corpus' shapes (lyrics lines,
  * movies, festival winners, labelled graph edges) — synthesized, not
  * copied (ref fixtures: test/schema/{Movies,Graphs}.scala + resources). */
object ReferenceParitySpec {

  case class Movie(title: String, year: Int, rating: Double)

  // the corpus' opaque UDF predicates (ref imports them from test.util)
  def p1(x: Int): Boolean = x % 3 != 0
  def p2(x: Int): Boolean = x % 5 > 1
  def p3(x: Int): Boolean = (x & 7) < 5
  case class Winner(year: Int, title: String)
  case class LabelledEdge(src: Long, dst: Long, label: String)
  case class MovieYear(year: Int)

  private val nouns =
    Vector("granite", "murmur", "lantern", "copper", "thicket", "harbor", "ember", "willow")
  private val verbs =
    Vector("drifts", "hums", "flickers", "settles", "wanders", "glows")

  /** 24 deterministic text lines; word lengths span 2-8 so the corpus'
    * length-window filters (3 < len < 9, len > 5) are all selective. */
  val lines: Seq[String] = (0 until 24).map { i =>
    val a = nouns(i % nouns.size)
    val v = verbs((i * 5) % verbs.size)
    val b = nouns((i * 3 + 2) % nouns.size)
    s"the $a $v over the $b at hour $i"
  }

  val (wordsEven, wordsOdd) = lines
    .flatMap(_.split("\\W+"))
    .partition(_.length % 2 == 0)

  /** 80 movies across decades 1950-2019; mixed title lengths; unique
    * titles (CSV round-trip sorts by title); ratings in [4.0, 9.9]. */
  val movies: Seq[Movie] = (0 until 80).map { i =>
    val title = if (i % 3 == 0) s"F$i" else s"Feature number $i"
    Movie(title, 1950 + (i * 7) % 70, 4.0 + ((i * 37) % 60) / 10.0)
  }

  /** Winner lists overlapping the movie list on (title, year) for some
    * rows and disjoint for others. */
  val cannes: Seq[Winner] =
    movies.zipWithIndex.collect { case (m, i) if i % 5 == 0 => Winner(m.year, m.title) } :+
      Winner(1999, "Offlist premiere")

  val berlin: Seq[Winner] =
    movies.zipWithIndex.collect { case (m, i) if i % 7 == 0 => Winner(m.year, m.title) } :+
      Winner(2003, "Second offlist")

  val graph: Seq[LabelledEdge] = (0L until 30L).map { i =>
    LabelledEdge(i % 10, (i * 3 + 1) % 10, if (i % 4 == 0) "B" else "X")
  }
}
