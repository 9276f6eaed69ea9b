package graft.api

import scala.language.experimental.macros
import scala.reflect.macros.blackbox

/** Minimal quotation front-end — the reference's flagship ergonomic
  * (`emma.onSpark { for-comprehension }` with automatic join derivation,
  * emma-spark onSpark.scala:23-27 + emma-language Combination.scala:58-77):
  * a compile-time rewrite of the two-generator comprehension
  *
  * {{{
  * onSpark { for { x <- xs; y <- ys; if kx(x) == ky(y); if p(x, y) } yield f(x, y) }
  * }}}
  *
  * into `xs.equiJoin(ys)(kx, ky).withFilter(p').map(f')` — the natural
  * syntax plans a real shuffled/broadcast JOIN instead of one Spark job
  * per left element. Guard handling mirrors the reference's Combination
  * rules for the 2-generator case: the first guard that splits into an
  * x-only side and a y-only side of an `==` becomes the join key
  * (ComprehensionCombinators equiJoin); every remaining guard becomes a
  * post-join filter; with no separable guard the generators combine by
  * `cross` and ALL guards filter the product.
  *
  * Deeper generator chains (3-way joins) are NOT derived — that requires
  * the reference's full normalization engine; they abort at compile time
  * with guidance rather than silently executing per-element jobs. The
  * design stance (SURVEY §7.1) keeps explicit `equiJoin`/`joined.on` as
  * the primary API; this macro recovers the reference syntax for the
  * dominant shape. Non-DataBag expressions pass through untouched.
  *
  * Mechanics note: the shape and the guard split are decided on the TYPED
  * tree (where `DataBag`-ness is provable), then the WHOLE expression is
  * untypechecked once and re-matched structurally for rebuilding —
  * untypechecking subtrees in isolation leaves stale symbols for
  * outer-bound names and breaks bytecode emission.
  */
object comprehensions {

  /** Rewrite the comprehension if it is the supported DataBag shape;
    * identity for anything else. Apply directly to the comprehension. */
  def onSpark[T](expr: T): T = macro ComprehensionMacro.onSpark[T]
}

class ComprehensionMacro(val c: blackbox.Context) {
  import c.universe._

  /** Strips type applications and extra (implicit) argument lists from a
    * single-argument method call: `qual.m[T](arg)(implicits...)`. */
  private object Call1 {
    def unapply(t: Tree): Option[(Tree, TermName, Tree)] = t match {
      case Apply(Select(q, n: TermName), List(a)) => Some((q, n, a))
      case Apply(TypeApply(Select(q, n: TermName), _), List(a)) => Some((q, n, a))
      case Apply(Call1(q, n, a), _) => Some((q, n, a))
      case _ => None
    }
  }

  private object Lam {
    def unapply(t: Tree): Option[(ValDef, Tree)] = t match {
      case Function(List(vd), body) => Some((vd, body))
      case Block(Nil, Function(List(vd), body)) => Some((vd, body))
      case _ => None
    }
  }

  private object Eq {
    def unapply(t: Tree): Option[(Tree, Tree)] = t match {
      case Apply(Select(l, TermName("$eq$eq")), List(r)) => Some((l, r))
      case Apply(TypeApply(Select(l, TermName("$eq$eq")), _), List(r)) => Some((l, r))
      case _ => None
    }
  }

  /** `base.withFilter(g1).withFilter(g2)...` peeled into (base, guards). */
  private object FilterChain {
    def unapply(t: Tree): Option[(Tree, List[(ValDef, Tree)])] = t match {
      case Call1(FilterChain(base, gs), TermName("withFilter"), Lam(v, g)) =>
        Some((base, gs :+ ((v, g))))
      case other => Some((other, Nil))
    }
  }

  /** The full two-generator comprehension shape. */
  private object Shape {
    def unapply(t: Tree): Option[(Tree, ValDef, Tree, List[(ValDef, Tree)], ValDef, Tree)] =
      t match {
        case Call1(xs, TermName("flatMap"),
              Lam(xv, Call1(FilterChain(ys, guards), TermName("map"), Lam(yv2, body)))) =>
          Some((xs, xv, ys, guards, yv2, body))
        case _ => None
      }
  }

  private def isDataBag(t: Tree): Boolean =
    t.tpe != null && t.tpe.baseClasses.exists(_.fullName == "graft.api.DataBag")

  private def uses(t: Tree, n: TermName): Boolean =
    t.exists { case Ident(`n`) => true; case _ => false }

  /** Untyped single-param lambda (param type left for inference). */
  private def lam(p: TermName, body: Tree): Tree =
    Function(List(ValDef(Modifiers(Flag.PARAM), p, TypeTree(), EmptyTree)), body)

  /** Lambda with a fresh param that rebinds `orig` around an (already
    * untypechecked) body. */
  private def rebound(orig: TermName, body: Tree): Tree = {
    val p = TermName(c.freshName("v$"))
    lam(p, q"{ val $orig = $p; $body }")
  }

  /** Which guard (if any) can key an equi-join, and whether its sides are
    * (x, y) or (y, x). Decided on the typed tree. */
  private def splitGuard(xv: ValDef, guards: List[(ValDef, Tree)]): Option[(Int, Boolean)] =
    guards.zipWithIndex.iterator.map { case ((gv, g), idx) =>
      g match {
        case Eq(l, r) if !uses(l, gv.name) && !uses(r, xv.name) => Some((idx, false))
        case Eq(l, r) if !uses(r, gv.name) && !uses(l, xv.name) => Some((idx, true))
        case _ => None
      }
    }.collectFirst { case Some(hit) => hit }

  def onSpark[T: c.WeakTypeTag](expr: c.Tree): c.Tree = expr match {
    case Shape(xs, xv, ys, guards, _, _)
        if isDataBag(xs) && isDataBag(ys) && !uses(ys, xv.name) =>
      val plan = splitGuard(xv, guards)
      // decide on the typed tree; rebuild from a whole-tree untypecheck
      c.untypecheck(expr) match {
        case Shape(uxs, uxv, uys, uguards, uyv2, ubody) =>
          val pair = TermName(c.freshName("xy$"))
          def paired(inner: Tree, yName: TermName): Tree =
            lam(pair, q"{ val ${uxv.name} = $pair._1; val $yName = $pair._2; $inner }")
          val joined = plan match {
            case Some((idx, swapped)) =>
              val (gv, g) = uguards(idx)
              val (xKey, yKey) = g match {
                case Eq(l, r) => if (swapped) (r, l) else (l, r)
                case _ => c.abort(c.enclosingPosition, "internal: guard shape changed")
              }
              val kx = rebound(uxv.name, xKey)
              val ky = rebound(gv.name, yKey)
              val rest = uguards.zipWithIndex.filter(_._2 != idx).map(_._1)
              rest.foldLeft(q"$uxs.equiJoin($uys)($kx, $ky)") {
                case (acc, (v, gg)) => q"$acc.withFilter(${paired(gg, v.name)})"
              }
            case None =>
              uguards.foldLeft(q"$uxs.cross($uys)") {
                case (acc, (v, gg)) => q"$acc.withFilter(${paired(gg, v.name)})"
              }
          }
          q"$joined.map(${paired(ubody, uyv2.name)})"
        case other =>
          c.abort(c.enclosingPosition,
            s"internal: untypechecked tree no longer matches the comprehension shape: $other")
      }

    // a DataBag flatMap whose inner bag is distributed but whose shape we
    // cannot combine (e.g. a 3-generator chain): error NOW, not per-element
    case Call1(xs, TermName("flatMap"), Lam(_, inner))
        if isDataBag(xs) && isDataBag(inner) =>
      c.abort(c.enclosingPosition,
        "onSpark derives joins only for the two-generator comprehension " +
        "shape; restructure deeper chains with explicit equiJoin/cross " +
        "(e.g. join two bags first, then comprehend over the pair bag)")

    case _ => expr
  }
}
