package graft.api

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}

/** Fixtures for the @lib import-capture SCOPE discipline (VERDICT r12
  * task 3): captured imports must be limited to those whose scope
  * encloses the annotated def and whose position precedes it, and a free
  * name resolving BOTH through a captured import and as a defining-
  * package member must abort — never silently bind the import. The
  * package-level `foo` / `decoy` pair lives in [[ScopedLibPool]] (its own
  * unit — see the note there). */

/** The helper under test: no import for `foo` is in scope HERE, so the
  * body's `foo` binds the package-level object. */
object ScopedLib {
  private implicit val tupEnc: Encoder[(Long, Long)] =
    Encoders.product[(Long, Long)]
  @lib def viaFoo(x: (Long, Long))(implicit spark: SparkSession): DataBag[(Long, Long)] =
    for { y <- foo.bag; if y._2 == x._2 } yield y
}

/** Sibling scope whose import must NOT travel with [[ScopedLib.viaFoo]]
  * (it neither encloses the def nor precedes it). */
object SiblingScope {
  import decoy.foo
  def touch(implicit spark: SparkSession): Long = foo.bag.size
}

/** A @lib def whose body calls ANOTHER object's @lib def (cross-OBJECT
  * nesting — [[CrossFileLibX.matchingAbove]] only pins same-object
  * nesting): the body's `CrossFileLibX` qualifies through the
  * own-package probe, then the inner call resolves symbol-verified and
  * splices recursively. */
object CrossObjectLib {
  private implicit val tupEnc2: Encoder[(Long, Long)] =
    Encoders.product[(Long, Long)]
  @lib def viaOther(x: (Long, Long), ys: DataBag[(Long, Long)]): DataBag[(Long, Long)] =
    for { y <- CrossFileLibX.matching(x, ys); if y._1 > 2L } yield y
}

/** Here the decoy import DOES enclose and precede the def — the captured
  * import and the defining package BOTH resolve `foo`, to different
  * paths; which one the definition site bound depends on same-unit
  * declaration order, which does not travel with the pickled source —
  * the splice must ABORT with fully-qualify guidance, never pick either. */
object AmbiguousLib {
  import decoy.foo
  private implicit val tupEnc: Encoder[(Long, Long)] =
    Encoders.product[(Long, Long)]
  @lib def viaAmbiguousFoo(x: (Long, Long))(implicit spark: SparkSession): DataBag[(Long, Long)] =
    for { y <- foo.bag; if y._2 == x._2 } yield y
}
