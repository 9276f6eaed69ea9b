package graft.api

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}

/** Cross-FILE `@lib` helpers for ComprehensionSpec: defined in a file the
  * splice sites never see; consumed through the pickled @graftSrc
  * registry (the reference's emma-lib consumption model,
  * compiler/lib/Lib.scala:40-55). The cross-RUN pin additionally consumes
  * main-source `graft.lib.QuotedLib` (compiled in a separate run). */
object CrossFileLibX {

  // encoders for the helpers' OWN standalone compilation; splice sites
  // re-resolve implicits in their own scope
  private implicit val tupEnc: Encoder[(Long, Long)] =
    Encoders.product[(Long, Long)]

  /** Sibling bag-builder referenced by [[matchingPool]] — tests
    * owner-member re-qualification at a foreign splice site. */
  def pool(implicit spark: SparkSession): DataBag[(Long, Long)] = {
    import spark.implicits._
    DataBag((1L to 30L).map(i => (i, i % 3)))
  }

  /** Plain parametric matcher — a dependent generator when quoted. */
  @lib def matching(x: (Long, Long), ys: DataBag[(Long, Long)]): DataBag[(Long, Long)] =
    for { y <- ys; if y._2 == x._2 } yield y

  /** References sibling [[pool]]: the splice qualifies the bare name to
    * this object's static path and resolves the implicit SparkSession at
    * the splice site. */
  @lib def matchingPool(x: (Long, Long))(implicit spark: SparkSession): DataBag[(Long, Long)] =
    for { y <- pool; if y._2 == x._2 } yield y

  /** Nested cross-file call — [[matching]] must inline recursively
    * (qualified by the re-binding pass, then resolved symbol-verified). */
  @lib def matchingAbove(x: (Long, Long), lo: Long,
      ys: DataBag[(Long, Long)]): DataBag[(Long, Long)] =
    for { y <- matching(x, ys); if y._1 > lo } yield y

  /** Mutually recursive pair — the splice-time cycle check must abort
    * (the defs themselves compile; only quoting them is rejected). */
  @lib def ping(x: (Long, Long), ys: DataBag[(Long, Long)]): DataBag[(Long, Long)] =
    for { y <- pong(x, ys); if y._1 > 0L } yield y

  @lib def pong(x: (Long, Long), ys: DataBag[(Long, Long)]): DataBag[(Long, Long)] =
    for { y <- ping(x, ys); if y._1 > 0L } yield y

  /** GENERIC matcher — the splice site monomorphizes `A` from the typed
    * call's resolved type arguments (reference: Lib.expand inlines
    * type-parameterized defs, emma-lib/.../ml/kfold.scala:27). */
  @lib def matchingGen[A](k: Long, ys: DataBag[(Long, A)])(
      implicit ev: Encoder[(Long, A)]): DataBag[(Long, A)] =
    for { y <- ys; if y._1 == k } yield y

  /** TWO type parameters, the second bound only through a parameter
    * type — both monomorphize from the one typed call. */
  @lib def matching2[A, B](k: (Long, B), ys: DataBag[(Long, A)])(
      implicit ev: Encoder[(Long, A)]): DataBag[(Long, A)] =
    for { y <- ys; if y._1 == k._1 } yield y

  /** Higher-kinded type parameter — must ABORT at the splice site (no
    * monomorphization target), never splice. */
  @lib def higherKinded[F[_]](ys: DataBag[(Long, Long)]): DataBag[(Long, Long)] =
    for { y <- ys; if y._1 > 0L } yield y

  /** Shadows its own type parameter in the body — blind substitution
    * would capture; must ABORT at the splice site. */
  @lib def shadowedTparam[A](k: Long, ys: DataBag[(Long, A)])(
      implicit ev: Encoder[(Long, A)]): DataBag[(Long, A)] = {
    type A = Long
    for { y <- ys; if y._1 == k } yield y
  }

  /** Mutually recursive SCALAR bag consumers (r14: scalar defs splice
    * too) — the splice-time cycle check must abort exactly like the
    * bag-returning [[ping]]/[[pong]] pair. */
  @lib def pingS(xs: DataBag[Long]): Long = pongS(xs) + 1L

  @lib def pongS(xs: DataBag[Long]): Long = pingS(xs) + 1L
}

/** Object-level `@lib` whose member declares its bag result through a
  * TYPE ALIAS — the r13 eligibility test (`showCode(tpt)` contains
  * "DataBag") silently skipped such members; since r14 every public
  * concrete def carries the source and the splice site's resolved-type
  * gate (returnsDataBag dealiases) decides. */
@lib object AliasedOpsX {
  type Rows = DataBag[(Long, Long)]

  private implicit val tupEnc: Encoder[(Long, Long)] =
    Encoders.product[(Long, Long)]

  /** Row-dependent, so a quoted use MUST splice (a dependent non-ctor
    * generator aborts without the carrier) — proving the alias-typed
    * member got its carrier. */
  def around(x: (Long, Long), ys: Rows): Rows =
    for { y <- ys; if y._2 == x._2 } yield y
}
