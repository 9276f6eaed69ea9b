package graft.api

import scala.language.experimental.macros
import scala.reflect.macros.blackbox

/** Quotation front-end — the reference's flagship ergonomic
  * (`emma.onSpark { for-comprehension }` with automatic join derivation,
  * emma-spark onSpark.scala:23-27 + emma-language Combination.scala:58-77):
  * a compile-time rewrite of linear generator chains
  *
  * {{{
  * onSpark {
  *   for { x <- xs; y <- ys; if kx(x) == ky(y); z <- zs; if h(y) == g(z) }
  *     yield f(x, y, z)
  * }
  * }}}
  *
  * into a LEFT FOLD of joins — `xs.equiJoin(ys)(...).equiJoin(zs)(...)
  * .map(...)` — so the natural syntax plans real shuffled/broadcast joins
  * instead of one Spark job per element. Guard handling mirrors the
  * reference's Combination rules: at each generator, guards that
  * reference only that generator's variable pre-filter its bag; the first
  * guard that splits an `==` into an earlier-variables-only side and a
  * new-variable-only side becomes the equi-join key; every remaining
  * guard filters after the join; with no separable guard the generators
  * combine by `cross`.
  *
  * The dependent-FILTER spelling also derives a join: in
  * `y <- ys.withFilter(y => k(x) == g(y))` the filter chain is peeled
  * into a guard before role analysis (the reference's `MatchFlatMap2`
  * shape, Combination.scala:261-297). Guard analysis identifies generator
  * references by SYMBOL on the typed tree, so a guard-local lambda that
  * shadows a generator name cannot demote a join key.
  *
  * Not derived (compile-time abort with guidance, never a silent
  * per-element job): dependent generators (a later bag genuinely built
  * from an earlier row) and non-linear shapes — the reference's full
  * normalization engine is out of scope by design stance (SURVEY §7.1);
  * explicit `equiJoin`/`joined.on` remains the primary API. Non-DataBag
  * expressions pass through untouched, as do comprehensions whose later
  * generators are LOCAL collections (they typecheck against the
  * IterableOnce overload and execute correctly without rewriting).
  *
  * Mechanics note: shape and guard analysis run on the TYPED tree (where
  * `DataBag`-ness is provable), then the WHOLE expression is untypechecked
  * once and re-matched structurally for rebuilding — untypechecking
  * subtrees in isolation leaves stale symbols for outer-bound names and
  * breaks bytecode emission.
  */
object comprehensions {

  /** Rewrite the comprehension if it is a supported DataBag chain;
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

  /** `base.withFilter(g1).withFilter(g2)...` peeled into (base, guards).
    * Top-level `&&` conjunctions split into separate guards (the
    * reference's MatchCollectEqualityGuards behavior) so an equality
    * conjunct still keys a join when spelled `if k(x) == g(y) && other`.
    * Guards are assumed pure (comprehension-calculus contract): a split
    * conjunct may be evaluated as a pre-filter on rows the short-circuit
    * would have skipped. */
  private object FilterChain {
    def unapply(t: Tree): Option[(Tree, List[(ValDef, Tree)])] = t match {
      case Call1(FilterChain(base, gs), TermName("withFilter"), Lam(v, g)) =>
        Some((base, gs ++ conjuncts(g).map((v, _))))
      case other => Some((other, Nil))
    }
  }

  private def conjuncts(g: Tree): List[Tree] = g match {
    case Apply(Select(l, TermName("$amp$amp")), List(r)) =>
      conjuncts(l) ++ conjuncts(r)
    case _ => List(g)
  }

  /** One generator level: `<- bag` with the guards attached to its source
    * (cross-variable guards desugar onto the NEXT generator's bag). */
  private case class Gen(v: ValDef, bag: Tree, guards: List[(ValDef, Tree)])

  /** Flattens `xs.wF(g)*.flatMap(x => ... .map(v => body))` into the
    * generator chain and the yield body. */
  private def flatten(t: Tree): Option[(List[Gen], Tree)] = t match {
    case Call1(FilterChain(bag, gs), TermName("flatMap"), Lam(v, rest)) =>
      flatten(rest).map { case (gens, body) => (Gen(v, bag, gs) :: gens, body) }
    case Call1(FilterChain(bag, gs), TermName("map"), Lam(v, body)) =>
      Some((List(Gen(v, bag, gs)), body))
    case _ => None
  }

  private def isDataBag(t: Tree): Boolean =
    t.tpe != null && t.tpe.baseClasses.exists(_.fullName == "graft.api.DataBag")

  /** Reference detection by SYMBOL identity on the typed tree — a guard
    * that contains a lambda shadowing a generator NAME must not count as
    * referencing that generator (name matching would demote its join key
    * to a post filter: still correct, worse plan). */
  private def uses(t: Tree, s: Symbol): Boolean =
    s != null && s != NoSymbol &&
      t.exists { case i: Ident => i.symbol == s; case _ => false }
  private def usesAny(t: Tree, ss: Seq[Symbol]): Boolean = ss.exists(uses(t, _))

  /** Untyped single-param lambda (param type left for inference). */
  private def lam(p: TermName, body: Tree): Tree =
    Function(List(ValDef(Modifiers(Flag.PARAM), p, TypeTree(), EmptyTree)), body)

  // ------------------------------------------------------- analysis (typed)

  /** How guard g of generator i combines, given outer variable names. */
  private sealed trait GuardRole
  private case object OwnFilter extends GuardRole  // references only var_i
  private case class JoinKey(swapped: Boolean) extends GuardRole
  private case object PostFilter extends GuardRole

  private def roleOf(outer: Seq[Symbol], own: Symbol, g: Tree): GuardRole =
    g match {
      case _ if !usesAny(g, outer) => OwnFilter
      case Eq(l, r) if !uses(l, own) && !usesAny(r, outer) => JoinKey(swapped = false)
      case Eq(l, r) if !uses(r, own) && !usesAny(l, outer) => JoinKey(swapped = true)
      case _ => PostFilter
    }

  /** Per level ≥ 2: the roles of its guards, with at most one JoinKey (the
    * first; later key-shaped guards demote to post filters). Generator
    * variables are identified by the symbols of the flatMap/map lambda
    * params; each guard's OWN variable by its own lambda param symbol. */
  private def analyze(gens: List[Gen]): List[List[GuardRole]] = {
    val syms = gens.map(_.v.symbol)
    gens.zipWithIndex.drop(1).map { case (gen, i) =>
      val outer = syms.take(i)
      var keyTaken = false
      gen.guards.map { case (gv, g) =>
        roleOf(outer, gv.symbol, g) match {
          case JoinKey(sw) if !keyTaken => keyTaken = true; JoinKey(sw)
          case JoinKey(_) => PostFilter
          case other => other
        }
      }
    }
  }

  // ------------------------------------------------------ rebuild (untyped)

  /** Accessor for variable j (1-based) in the stage-i nested pair
    * ((...(v1,v2),v3)...,vi). */
  private def accessor(p: TermName, j: Int, i: Int): Tree = {
    val down = (1 to (i - j)).foldLeft(q"$p": Tree)((t, _) => q"$t._1")
    if (j > 1) q"$down._2" else down
  }

  /** { val v1 = acc1; ...; val vi = acci; inner } under a fresh pair
    * param. `renameLast` substitutes the binding NAME of v_i (guard and
    * map lambdas carry their own parameter names). */
  private def bound(names: Seq[TermName], i: Int, inner: Tree,
      lastName: Option[TermName] = None): Tree = {
    val p = TermName(c.freshName("p$"))
    val vals = (1 to i).map { j =>
      val n = if (j == i) lastName.getOrElse(names(j - 1)) else names(j - 1)
      q"val $n = ${accessor(p, j, i)}"
    }
    lam(p, q"{ ..$vals; $inner }")
  }

  def onSpark[T: c.WeakTypeTag](expr: c.Tree): c.Tree = {
    val typedChain = flatten(expr)
    typedChain match {
      case Some((gens, _)) if gens.length >= 2 && isDataBag(gens.head.bag) &&
          gens.tail.exists(g => isDataBag(g.bag)) =>
        val names = gens.map(_.v.name)
        val syms = gens.map(_.v.symbol)
        if (names.distinct.length != names.length)
          c.abort(c.enclosingPosition,
            "onSpark: generator variable names must be distinct")
        // a tail that MIXES DataBag and local-collection generators would
        // pass through to DataBag.flatMap's distributed-inner overload and
        // throw at runtime — reject it here with guidance instead (an
        // ALL-local tail never reaches this case: the pattern guard skips
        // it and the expression passes through untouched, running
        // correctly via the IterableOnce overload)
        for (gen <- gens.tail if !isDataBag(gen.bag))
          c.abort(c.enclosingPosition,
            s"onSpark: generator '${gen.v.name}' is not a DataBag — mixing DataBag and " +
            "local-collection generators is not derived; lift the local collection into a " +
            "DataBag or restructure")
        // every later bag must be independent of earlier generators — the
        // dependent-FILTER spelling (ys.withFilter(y => k(x) == g(y))) is
        // already peeled into a guard by FilterChain and derives a join;
        // what remains here is a bag genuinely built from an earlier row
        for ((gen, i) <- gens.zipWithIndex.drop(1)) {
          if (usesAny(gen.bag, syms.take(i)))
            c.abort(c.enclosingPosition,
              s"onSpark: generator '${gen.v.name}' depends on an earlier generator variable; " +
              "dependent generators are not derived — join explicitly or restructure")
        }
        val roles = analyze(gens)
        // rebuild from a single whole-expression untypecheck
        flatten(c.untypecheck(expr)) match {
          case Some((ugens, ubody)) =>
            val head = ugens.head
            // level-1 guards reference only v1: pre-filter the first bag
            val first = head.guards.foldLeft(head.bag) { case (acc, (gv, g)) =>
              q"$acc.withFilter(${lam(gv.name, g)})"
            }
            val joinedAll = ugens.zip(roles.map(Some(_)).prepended(None))
              .zipWithIndex.drop(1)
              .foldLeft(first) { case (acc, ((gen, Some(levelRoles)), idx)) =>
                val i = idx + 1 // 1-based stage AFTER this join
                val own = gen.guards.zip(levelRoles).collect {
                  case ((gv, g), OwnFilter) => (gv, g) }
                val key = gen.guards.zip(levelRoles).collectFirst {
                  case ((gv, g), JoinKey(sw)) => (gv, g, sw) }
                val post = gen.guards.zip(levelRoles).collect {
                  case ((gv, g), PostFilter) => (gv, g) }
                val bag = own.foldLeft(gen.bag) { case (b, (gv, g)) =>
                  q"$b.withFilter(${lam(gv.name, g)})"
                }
                val joined = key match {
                  case Some((gv, g, swapped)) =>
                    val (accSide, newSide) = g match {
                      case Eq(l, r) => if (swapped) (r, l) else (l, r)
                      case _ => c.abort(c.enclosingPosition, "internal: key guard shape changed")
                    }
                    // key over the accumulated tuple: bind v1..v_{i-1}
                    val kAcc = bound(names, i - 1, accSide)
                    val kNew = lam(gv.name, newSide)
                    q"$acc.equiJoin($bag)($kAcc, $kNew)"
                  case None =>
                    q"$acc.cross($bag)"
                }
                // demoted / mixed guards filter the joined pair; the guard's
                // own param name binds the NEW side
                post.foldLeft(joined) { case (j, (gv, g)) =>
                  q"$j.withFilter(${bound(names, i, g, Some(gv.name))})"
                }
              case (acc, ((_, None), _)) => acc
            }
            q"$joinedAll.map(${bound(names, ugens.length, ubody, Some(ugens.last.v.name))})"
          case None =>
            c.abort(c.enclosingPosition,
              "internal: untypechecked tree no longer matches the comprehension shape")
        }

      // a DataBag flatMap whose inner bag is distributed but whose shape we
      // cannot combine: error NOW, not per-element at runtime
      case _ =>
        expr match {
          case Call1(xs, TermName("flatMap"), Lam(_, inner))
              if isDataBag(xs) && isDataBag(inner) =>
            c.abort(c.enclosingPosition,
              "onSpark could not derive joins for this comprehension shape; " +
              "use explicit equiJoin/cross or restructure the generators")
          case _ => expr
        }
    }
  }
}
