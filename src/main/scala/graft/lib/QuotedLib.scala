package graft.lib

import graft.api._
import graft.{CustRow, OrderRow}

/** Cross-FILE quoted-pipeline helpers — the reference's emma-lib story:
  * `@emma.lib` defs are consumed by quoted programs from any file
  * (emma-language compiler/lib/Lib.scala:40-55; e.g. emma-lib
  * graphs/transitiveClosure.scala:22-44 is inlined cross-file). Here the
  * `@graft.api.lib` annotation stores each def's source in a pickled
  * @graftSrc annotation; `comprehensions.onSpark` splice sites in ANY
  * file (and any compilation run) parse, re-qualify, and beta-reduce it
  * into the comprehension so it participates in join derivation. */
object QuotedLib {

  /** Order-value floor shared by [[bigOrdersOf]] — a sibling reference
    * the splice re-qualifies to this object's static path. */
  final val bigFloor = 150000.0

  // encoder for the helper's OWN (standalone) compilation only: a splice
  // site re-typechecks the parsed source in its own scope and resolves
  // implicits there (spark.implicits._ / Encoders.product at the caller)
  private implicit val orderEnc: org.apache.spark.sql.Encoder[OrderRow] =
    org.apache.spark.sql.Encoders.product[OrderRow]

  /** High-value orders of customer `c`: called from a quoted
    * comprehension in another file, this inlines and derives the same
    * single equi join as the written-out spelling (gate q249). */
  @lib def bigOrdersOf(c: CustRow, orders: DataBag[OrderRow]): DataBag[OrderRow] =
    for { o <- orders; if o.o_custkey == c.c_custkey && o.o_totalprice > bigFloor }
      yield o

  /** GENERIC keyed subset — the reference's type-parameterized library
    * story (emma-lib defs are routinely generic and Lib.expand inlines
    * them: `kfold.split[A: Meta]` emma-lib/.../ml/kfold.scala:27,
    * `transitiveClosure.apply[V: Meta]`
    * emma-lib/.../graphs/transitiveClosure.scala:24): the splice site
    * monomorphizes `A` from the TYPED call's resolved type arguments,
    * the evidence param re-resolves there, and the comprehension derives
    * the same equi join as a hand-monomorphized spelling (gate q250). */
  @lib def keyedOver[A](key: Long, xs: DataBag[(Long, A)])(
      implicit ev: org.apache.spark.sql.Encoder[(Long, A)]): DataBag[(Long, A)] =
    for { x <- xs; if x._1 == key } yield x
}

/** Object-LEVEL `@lib` — the reference's documented module spelling
  * (`@emma.lib object stat`, emma-lib/.../lib/stats/stat.scala:22; every
  * emma-lib module ships that way): the annotation walks the object and
  * attaches the @graftSrc carrier to each public concrete
  * DataBag-returning member def; scalar members (like [[QuotedOps.cents]])
  * stay plain methods, reachable from spliced bodies through owner-path
  * re-qualification (gate q251 consumes two members in one quote). */
@lib object QuotedOps {

  // encoder for the members' OWN (standalone) compilation only — a val,
  // so the object-level walk leaves it untouched; splice sites re-resolve
  // implicits in their own scope
  private implicit val orderEnc: org.apache.spark.sql.Encoder[OrderRow] =
    org.apache.spark.sql.Encoders.product[OrderRow]

  /** Scalar sibling — no carrier; spliced member bodies call it through
    * the re-qualified `_root_.graft.lib.QuotedOps.cents` static path. */
  def cents(v: Double): Long = (v * 100 + 0.5).floor.toLong

  /** Orders of customer `c` — derives an equi join when quoted. */
  def ordersOf(c: CustRow, orders: DataBag[OrderRow]): DataBag[OrderRow] =
    for { o <- orders; if o.o_custkey == c.c_custkey } yield o

  /** Orders whose integer-cents price clears `lo` — the guard calls the
    * scalar sibling [[cents]]. */
  def pricierCents(lo: Long, orders: DataBag[OrderRow]): DataBag[OrderRow] =
    for { o <- orders; if cents(o.o_totalprice) > lo } yield o

  /** GENERIC member of an object-level module — the object-level walk and
    * splice-site monomorphization compose (spec-pinned). */
  def keyedVals[A](key: Long, xs: DataBag[(Long, A)])(
      implicit ev: org.apache.spark.sql.Encoder[(Long, A)]): DataBag[(Long, A)] =
    for { x <- xs; if x._1 == key } yield x
}
