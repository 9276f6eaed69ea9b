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
}
