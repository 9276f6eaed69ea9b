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
  * PATTERN generators are supported: `for { (a, b) <- pairs; ... }`
  * destructures through the rewrite — the flatMap/map/guard lambdas
  * scalac desugars to single-case match-lambdas are recognized, pattern
  * binds participate in guard role analysis individually, and the
  * rebuilt key/filter/yield lambdas re-match the pattern against the
  * accumulated join tuple. (A refutable pattern's `check$ifrefutable`
  * filter simply stays fused to its generator's bag.)
  *
  * The dependent-FILTER spelling also derives a join: in
  * `y <- ys.withFilter(y => k(x) == g(y))` the filter chain is peeled
  * into a guard before role analysis (the reference's `MatchFlatMap2`
  * shape, Combination.scala:261-297), and top-level `&&` conjunctions
  * split into separate guards (the reference's equality-guard
  * collection), so `if k(x) == g(y) && other` still keys the join.
  * Guard analysis identifies generator references by SYMBOL on the typed
  * tree, so a guard-local lambda that shadows a generator name cannot
  * demote a join key.
  *
  * Dependent generators over a LITERAL `DataBag(seq)` constructor derive
  * the reference's `MatchFlatMap1` lowering (Combination.scala:188-209):
  * `for { x <- xs; y <- DataBag(f(x)) }` compiles to
  * `xs.flatMap(x => f(x).map(...))` — the inner collection is provably a
  * driver-shaped local Seq per element, so this is a narrow flatMap, not
  * a job per row; its guards post-filter the pair, and later generators
  * keep deriving joins on top.
  *
  * QUANTIFIED GUARDS derive semi/anti joins (the reference reaches these
  * shapes through fold fusion over nested comprehensions,
  * emma-compiler FoldForestFusion + Combination; here the SQL-shaped
  * subset lowers to the relational operator directly):
  * `if ys.exists(y => k(y) == k'(x) [&& p(y) ...])` becomes
  * `.semiJoin(ys.withFilter(p))(k', k)` — the correlated-EXISTS subquery —
  * its negation becomes `.antiJoin` (NOT EXISTS), and
  * `ys.forall(y => k(y) != k'(x))` is recognized as the same anti join.
  * The emptiness spellings normalize to the same plans:
  * `ys.withFilter(y => ...).nonEmpty` IS `ys.exists(y => ...)` and
  * `.isEmpty` its negation.
  * Multiple separable equalities tuple into a composite key; `ys` must be
  * independent of the generators. Any OTHER guard that references a
  * distributed bag aborts at compile time (it would capture the bag in an
  * executor-side closure — a guaranteed runtime crash).
  *
  * CORRELATED SCALAR FOLDS (the reference's FoldGroupFusion pass reached
  * from the quotation front-end) derive in BOTH positions: in the head —
  * `yield (x, ys.count(y => k(y) == k'(x) [&& p(y)]))`, `.withFilter(key)
  * [.map(v)].sum`, `.size` — and in guards — `if ys.count(key) >= 2`
  * (the SQL correlated-HAVING shape). Each fold becomes ONE combinable
  * pre-aggregation of the inner bag by its key ([[FoldGroups.sumJoin]])
  * plus a left outer join whose miss-default is the monoid zero; guard
  * folds filter on the widened tuple and project the fold levels back
  * off. `min`/`max` (no empty-group zero) pre-aggregate the same way but
  * join in a THROW for a missing group — the sequential semantics of
  * `min` on an empty bag, so non-crashing programs get identical values.
  * Keyless folds hoist (see below) and generator-dependent mapped values
  * abort with guidance.
  *
  * UNCORRELATED GLOBAL FOLDS (SQL's uncorrelated scalar subquery,
  * e.g. `if o.price > orders.map(cents).sum / orders.size`): a fold /
  * quantifier / emptiness call on a distributed bag that references no
  * comprehension-bound variable hoists into a driver `val` before the
  * pipeline — evaluated eagerly, ONCE, in occurrence order — and the
  * comprehension re-derives with the value as a plain local. The hoist
  * covers every position (guards, the yield, generator bag expressions)
  * and every fold spelling (`sum`/`size`/`count`/`min`/`max`/`product`/
  * `exists`/`forall`/`nonEmpty`/`isEmpty`/`find`/`top`/`bottom`/
  * `reduce`/`fold`/`sample`); without it the bag would ride an
  * executor-side closure — a guaranteed runtime crash.
  *
  * HEAD/GUARD NESTING at ANY depth (the reference's Normalize.scala:44-52
  * fixpoint re-expressed for closure positions): a yield OR guard whose
  * body contains nested comprehensions over literal `DataBag(seq)` ctors —
  * e.g. `yield (x, (for { w <- DataBag(1L to x) } yield w).sum)`, the same
  * fold in an `if`, or a depth-2 shape whose inner yield nests another
  * literal-ctor comprehension — re-roots EVERY such ctor onto the
  * closure-safe [[LocalBag]] (whose ops and folds share the distributed
  * bag's Alg algebras, so the value is identical) and runs the whole
  * nest narrowly inside the map/filter closure. A DISTRIBUTED bag
  * captured in the yield or a guard still aborts with guidance (it would
  * crash on the executor).
  *
  * Not derived (compile-time abort with guidance, never a silent
  * per-element job): dependent generators over a DISTRIBUTED bag (a later
  * bag genuinely built from an earlier row) and non-linear shapes — the reference's full
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

  /** Single-param lambda, plain `x => body` or the single-case
    * match-lambda scalac desugars pattern generators/guards to:
    * `x$1 => x$1 match { case pat => body }`. Returns the param, the
    * pattern (None for plain), and the body. */
  private object GenLam {
    def unapply(t: Tree): Option[(ValDef, Option[Tree], Tree)] = t match {
      case Function(List(vd), Match(sel, List(CaseDef(pat, EmptyTree, body))))
          if selIs(sel, vd.name) => Some((vd, Some(pat), body))
      case Function(List(vd), body) => Some((vd, None, body))
      case Block(Nil, inner) => unapply(inner)
      case _ => None
    }
    private def selIs(sel: Tree, n: TermName): Boolean = sel match {
      case Ident(`n`) => true
      case Typed(inner, _) => selIs(inner, n)
      case Annotated(_, inner) => selIs(inner, n)
      case _ => false
    }
  }

  /** A guard as peeled from a withFilter: its lambda param, its pattern
    * (for pattern-generator guards), and one conjunct of its condition. */
  private case class Guard(v: ValDef, pat: Option[Tree], cond: Tree)

  private object Eq {
    def unapply(t: Tree): Option[(Tree, Tree)] = t match {
      case Apply(Select(l, TermName("$eq$eq")), List(r)) => Some((l, r))
      case Apply(TypeApply(Select(l, TermName("$eq$eq")), _), List(r)) => Some((l, r))
      case _ => None
    }
  }

  private object Neq {
    def unapply(t: Tree): Option[(Tree, Tree)] = t match {
      case Apply(Select(l, TermName("$bang$eq")), List(r)) => Some((l, r))
      case Apply(TypeApply(Select(l, TermName("$bang$eq")), _), List(r)) => Some((l, r))
      case _ => None
    }
  }

  /** `bag.exists(lam)` / `bag.forall(lam)`, under any number of `!`s.
    * Returns (bag, lambda param, lambda pattern, lambda body, method name,
    * negated). The emptiness spellings normalize here too:
    * `bag.withFilter(lam).nonEmpty` IS `bag.exists(lam)` and
    * `.isEmpty` its negation (earlier withFilters stay fused to the bag,
    * where inner-only ones remain derivable as bag pre-filters).
    * Shape-only — works on typed AND untyped trees. */
  private object QuantCall {
    def unapply(t: Tree): Option[(Tree, ValDef, Option[Tree], Tree, TermName, Boolean)] =
      t match {
        case Select(QuantCall(b, v, p, body, m, neg), TermName("unary_$bang")) =>
          Some((b, v, p, body, m, !neg))
        case Call1(b, m, GenLam(v, p, body))
            if m == TermName("exists") || m == TermName("forall") =>
          Some((b, v, p, body, m, false))
        case Select(Call1(b, TermName("withFilter"), GenLam(v, p, body)), m)
            if m == TermName("nonEmpty") || m == TermName("isEmpty") =>
          Some((b, v, p, body, TermName("exists"), m == TermName("isEmpty")))
        case _ => None
      }
  }

  /** `base.withFilter(g1).withFilter(g2)...` peeled into (base, guards).
    * Top-level `&&` conjunctions split into separate guards (the
    * reference's MatchCollectEqualityGuards behavior) so an equality
    * conjunct still keys a join when spelled `if k(x) == g(y) && other`.
    * Guards are assumed pure (comprehension-calculus contract): a split
    * conjunct may be evaluated as a pre-filter on rows the short-circuit
    * would have skipped. A two-case `check$ifrefutable` filter does NOT
    * match GenLam and so stays fused to the bag — exactly right. */
  private object FilterChain {
    def unapply(t: Tree): Option[(Tree, List[Guard])] = t match {
      case Call1(FilterChain(base, gs), TermName("withFilter"), GenLam(v, pat, g)) =>
        Some((base, gs ++ conjuncts(g).map(Guard(v, pat, _))))
      case other => Some((other, Nil))
    }
  }

  private def conjuncts(g: Tree): List[Tree] = g match {
    case Apply(Select(l, TermName("$amp$amp")), List(r)) =>
      conjuncts(l) ++ conjuncts(r)
    case _ => List(g)
  }

  /** One generator level: `pat <- bag` with the guards attached to its
    * source (cross-variable guards desugar onto the NEXT generator's bag). */
  private case class Gen(v: ValDef, pat: Option[Tree], bag: Tree, guards: List[Guard]) {
    def display: String = pat.map(_.toString).getOrElse(v.name.toString)
  }

  /** Flattens `xs.wF(g)*.flatMap(x => ... .map(v => body))` into the
    * generator chain and the yield body. */
  private def flatten(t: Tree): Option[(List[Gen], Tree)] = t match {
    case Call1(FilterChain(bag, gs), TermName("flatMap"), GenLam(v, pat, rest)) =>
      flatten(rest).map { case (gens, body) => (Gen(v, pat, bag, gs) :: gens, body) }
    case Call1(FilterChain(bag, gs), TermName("map"), GenLam(v, pat, body)) =>
      Some((List(Gen(v, pat, bag, gs)), body))
    case _ => None
  }

  private def isDataBag(t: Tree): Boolean =
    t.tpe != null && t.tpe.baseClasses.exists(_.fullName == "graft.api.DataBag")

  /** A literal `DataBag(expr)` / `DataBag.apply(expr)` constructor call —
    * the one dependent-generator shape that is PROVABLY local (the inner
    * collection is a driver-side Seq built per element), so the
    * reference's MatchFlatMap1 lowering (Combination.scala:188-209) is
    * safe: no distributed bag is built per row. */
  private def isLocalBagCtor(t: Tree): Boolean = t match {
    case Call1(q, TermName("apply"), _) =>
      (q.symbol != null && q.symbol.fullName == "graft.api.DataBag") ||
        (t.symbol != null && t.symbol.fullName == "graft.api.DataBag.apply")
    case _ => false
  }

  /** The Seq argument of a (typed or untyped) `DataBag(expr)` call. */
  private def localBagArg(t: Tree): Option[Tree] = t match {
    case Call1(_, TermName("apply"), a) => Some(a)
    case _ => None
  }

  /** A `DataBag`-typed Ident/Select inside the yield head — a DISTRIBUTED
    * bag captured in a closure that will execute on executors (a guaranteed
    * runtime crash: no SparkSession there). The literal-ctor chain never
    * trips this: its `DataBag.apply(...)` node is an Apply, not an
    * Ident/Select. */
  private def distributedRefInHead(t: Tree): Option[Tree] = distributedValueRef(t)

  /** A `DataBag`-typed VALUE reference anywhere in `t` — a distributed bag
    * captured in a closure that would execute on executors. The `DataBag`
    * companion MODULE reference inside a ctor chain must not trip this
    * (its module-class fullName collides with the class). */
  private def distributedValueRef(t: Tree): Option[Tree] = {
    def isValueRef(r: Tree): Boolean =
      isDataBag(r) && (r.symbol == null || !r.symbol.isModule)
    t.find {
      case i @ Ident(_) => isValueRef(i)
      case s @ Select(_, _) => isValueRef(s)
      case _ => false
    }
  }

  // --------------------------------------- quantified (EXISTS) guards

  /** How one conjunct of a quantified guard's lambda body participates. */
  private sealed trait ConjRole
  /** Uses only the quantifier's lambda variables: pre-filters the bag. */
  private case object InnerFilter extends ConjRole
  /** An equality (inequality under forall) separable into a generator-
    * variables side and a lambda-variables side: the semi/anti join key.
    * `swapped` = the LEFT side is the lambda (inner) side. */
  private case class KeyPair(swapped: Boolean) extends ConjRole
  /** A guard `[!]bag.exists(y => ...)` / `bag.forall(y => k != k')`
    * derived as a semi (anti) join of the accumulated chain against
    * `bag`. Computed on the TYPED guard; applied positionally to the
    * untyped twin (conjunct splitting is deterministic on both). */
  private case class SemiPlan(anti: Boolean, conj: List[ConjRole])

  /** The reference normalizes quantified guards through fold fusion
    * (emma-language Fold-Group-Fusion + Combination); here the SQL-shaped
    * subset lowers to the relational operator directly:
    * `bag.exists(y => k(y) == k'(vars) [&& p(y) ...])` ⇒ semiJoin,
    * its negation ⇒ antiJoin, `bag.forall(y => k(y) != k'(vars))` ⇒
    * antiJoin (and its negation ⇒ semiJoin). `bag` must be independent of
    * the generators; extra conjuncts must use only the lambda variable
    * (they pre-filter `bag` — sound for exists/NOT-exists since
    * ¬∃y. p(y) ∧ q(y) ⟺ no match in the p-filtered bag; under an
    * UN-negated forall a conjunction is NOT one anti join, so it is
    * rejected there). Returns None for underivable shapes (callers abort
    * with guidance — never compile a bag capture into an executor
    * closure). */
  private def semiPlanOf(allGen: Seq[Symbol], cond: Tree): Option[SemiPlan] = cond match {
    case QuantCall(bag, v, pat, body, m, neg) if isDataBag(bag) && !usesAny(bag, allGen) =>
      val inner = pat.map(bindSyms).getOrElse(List(v.symbol))
      val isForall = m == TermName("forall")
      val anti = neg ^ isForall
      val cs = conjuncts(body)
      // forall decomposes ONLY as a single inequality: forall(a != k1 &&
      // b != k2) means every y misses k1 AND misses k2 — a conjunction of
      // two anti joins, NOT one composite-key anti join (which would only
      // drop rows where a single y matches BOTH)
      if (isForall && cs.length != 1) None
      else {
        val roles: List[Option[ConjRole]] = cs.map { cj =>
          val asKey = cj match {
            case Eq(l, r) if !isForall => separableKey(allGen, inner, l, r, cj)
            case Neq(l, r) if isForall => separableKey(allGen, inner, l, r, cj)
            case _ => None
          }
          asKey.orElse {
            // inner-only conjuncts pre-filter the bag — sound for exists
            // and NOT exists, NOT decomposable under (negated) forall
            if (!isForall && !usesAny(cj, allGen) && distributedValueRef(cj).isEmpty)
              Some(InnerFilter)
            else None
          }
        }
        if (roles.forall(_.isDefined) && roles.flatten.exists(_.isInstanceOf[KeyPair]))
          Some(SemiPlan(anti, roles.map(_.get)))
        else None
      }
    case _ => None
  }

  /** Lower one quantified guard (untyped twin `g`, typed-derived `plan`)
    * onto the accumulated chain: pre-filter the bag with the inner-only
    * conjuncts, key the semi/anti join on the (tupled) separable
    * equalities. `mkOuter` builds the accumulated-side key lambda (a
    * plain binder at level 1, the stage-tuple rebind at level i). */
  private def lowerSemi(acc: Tree, g: Guard, plan: SemiPlan, mkOuter: Tree => Tree): Tree =
    g.cond match {
      case QuantCall(bag, v, pat, body, _, _) =>
        val cs = conjuncts(body)
        if (cs.length != plan.conj.length)
          c.abort(c.enclosingPosition,
            "internal: quantified guard shape changed after untypecheck")
        val zipped = cs.zip(plan.conj)
        val bagF = zipped.collect { case (cj, InnerFilter) => cj }
          .foldLeft(bag)((b, cj) => q"$b.withFilter(${binderLam(v.name, pat, cj)})")
        val pairs = zipped.collect { case (cj, KeyPair(sw)) =>
          val (l, r) = Eq.unapply(cj).orElse(Neq.unapply(cj)).getOrElse(
            c.abort(c.enclosingPosition,
              "internal: key conjunct shape changed after untypecheck"))
          if (sw) (r, l) else (l, r) // (outer, inner)
        }
        val (outerK, innerK) = pairs match {
          case List((o, in)) => (o, in)
          case more => (q"(..${more.map(_._1)})", q"(..${more.map(_._2)})")
        }
        val meth = TermName(if (plan.anti) "antiJoin" else "semiJoin")
        q"$acc.$meth($bagF)(${mkOuter(outerK)}, ${binderLam(v.name, pat, innerK)})"
      case _ =>
        c.abort(c.enclosingPosition,
          "internal: quantified guard no longer matches after untypecheck")
    }

  /** A guard whose condition compares correlated fold values (the SQL
    * correlated-HAVING shape, `if ys.count(y => k(y) == k'(x)) >= 2`):
    * every [[FoldCall]] occurrence must be derivable and no other
    * distributed reference may remain. Plans align positionally with the
    * untyped twin. */
  private case class GuardFolds(plans: List[Option[FoldPlan]])

  /** [[foldPlanOf]] additionally requiring that the fold subtree reads no
    * symbol BOUND IN THE POSITION outside the fold itself (an enclosing
    * Block's val, an enclosing fold's lambda param): the lowered
    * pre-aggregation is built OUTSIDE the comprehension, where such a
    * reference is unbound — deriving it would emit a bare "not found"
    * typer error instead of the guided abort. (When the enclosing val's
    * rhs is bag-free, the ANF-inverse val inlining re-exposes the
    * derivable val-free spelling on the next expansion pass.) */
  private def foldPlanAt(allGen: Seq[Symbol], pos: Tree)(t: Tree): Option[FoldPlan] =
    foldPlanOf(allGen, t).filter { _ =>
      !usesAny(t, (defSymsIn(pos) -- defSymsIn(t)).toSeq)
    }

  private def guardFoldsOf(allGen: Seq[Symbol], cond: Tree): Option[GuardFolds] = {
    val occ = collectFoldCalls(cond, foldPlanAt(allGen, cond))
    val derived = occ.collect { case (t, Some(_)) => t }
    if (derived.nonEmpty && distributedRefOutside(cond, derived).isEmpty)
      Some(GuardFolds(occ.map(_._2)))
    else None
  }

  /** Lower one fold-comparing guard: append the fold values via
    * [[lowerFold]]'s sumJoins, filter on the substituted condition over
    * the widened tuple, then project the fold levels back off so later
    * stages see the unchanged stage shape. `stageBinders` are the current
    * stage's binders with the guard's OWN binder in the last generator
    * slot. */
  private def lowerGuardFolds(acc: Tree, g: Guard, gf: GuardFolds,
      stageBinders: List[Binder]): Tree = {
    val occ = collectFoldCallsReplay(g.cond, gf.plans.map(_.isDefined))
    if (occ.length != gf.plans.length)
      c.abort(c.enclosingPosition,
        "internal: guard folds changed after untypecheck")
    val derived = occ.zip(gf.plans).collect { case (t, Some(p)) => (t, p) }
    val names = derived.map(_ => TermName(c.freshName("fold$")))
    val foldBinders = names.map(Binder(_, None))
    val n0 = stageBinders.length
    val withFolds = lowerFoldChain(acc, derived,
      j => o => bound(stageBinders ++ foldBinders.take(j), n0 + j, o))
    val cond2 = substituteAll(g.cond, derived.map(_._1).zip(names))
    val filtered = q"$withFolds.withFilter(${
      bound(stageBinders ++ foldBinders, n0 + derived.length, cond2)})"
    val p = TermName(c.freshName("p$"))
    val back = (1 to derived.length).foldLeft(q"${Ident(p)}": Tree)((t, _) => q"$t._1")
    q"$filtered.map(${lam(p, back)})"
  }

  // ----------------------------------------- groupBy-comprehension fusion

  private val seqFoldKinds: Set[TermName] =
    Set("count", "sum", "product", "min", "max", "exists", "forall").map(TermName(_))
  private val seqStageKinds: Set[TermName] =
    Set("filter", "map").map(TermName(_))

  /** One Seq-fold over a group's values — `<root>.filter(p)*.map(f)?.FOLD`
    * with FOLD ∈ size|count|sum|product|min|max — as (root, stages
    * root-first, fold kind, fold argument). Shape-only (typed and untyped);
    * implicit Numeric/Ordering arguments arrive as the fold argument. */
  private def seqFoldChain(t: Tree)
      : Option[(Tree, List[(TermName, Tree)], TermName, Option[Tree])] = {
    def peel(t: Tree, acc: List[(TermName, Tree)]): (Tree, List[(TermName, Tree)]) =
      t match {
        case Call1(q, n, a) if seqStageKinds(n) => peel(q, (n, a) :: acc)
        case other => (other, acc)
      }
    t match {
      case Select(q, n @ TermName("size")) =>
        val (r, st) = peel(q, Nil); Some((r, st, n, None))
      case Call1(q, n, a) if seqFoldKinds(n) =>
        val (r, st) = peel(q, Nil); Some((r, st, n, Some(a)))
      case _ => None
    }
  }

  private type GroupFoldOcc = (Tree, List[(TermName, Tree)], TermName, Option[Tree])

  /** Preorder `values`-rooted Seq-fold occurrences (matched subtrees are
    * not descended into — validation rejects nested `g` references, so
    * valid programs have none). */
  private def collectGroupFolds(body: Tree, isRoot: Tree => Boolean)
      : List[GroupFoldOcc] = {
    val out = scala.collection.mutable.ListBuffer.empty[GroupFoldOcc]
    val trav = new Traverser {
      override def traverse(t: Tree): Unit = seqFoldChain(t) match {
        case Some((root, st, kind, arg)) if isRoot(root) => out += ((t, st, kind, arg))
        case _ => super.traverse(t)
      }
    }
    trav.traverse(body)
    out.toList
  }

  /** Inline Block-level `val a = <g>.values` / `val a = <g>.key` aliases so
    * fold chains and key reads root at the Group binder itself — the
    * reference's FoldGroup "of case classes multiple times" spelling
    * (BaseCodegenIntegrationSpec.scala:322-336) binds `decade.values` to a
    * local val and folds THAT. Runs on both the typed tree (symbol-keyed
    * substitution) and the untyped rebuild (name-keyed); a name-shadowing
    * disagreement between the two is caught by the fold count-agreement
    * abort. Aliases chain (`val w = v`) because each rhs is substituted
    * before classification; non-alias vals (incl. fold-valued ones) stay
    * in place and get their rhs folds substituted like any other subtree. */
  private def inlineGroupAliases(body: Tree, isG: Tree => Boolean): Tree = {
    val tr = new Transformer {
      private var subs = List.empty[(Tree => Boolean, Tree)]
      override def transform(t: Tree): Tree = t match {
        case i: Ident =>
          subs.collectFirst { case (m, r) if m(i) => r }.getOrElse(i)
        case Block(stats, expr) =>
          val saved = subs
          val kept = stats.flatMap {
            case vd @ ValDef(mods, name, tpt, rhs0)
                if !mods.hasFlag(Flag.LAZY) && !mods.hasFlag(Flag.MUTABLE) &&
                  rhs0.nonEmpty =>
              val rhs = transform(rhs0)
              rhs match {
                case Select(q, TermName("values" | "key")) if isG(q) =>
                  val matcher: Tree => Boolean =
                    if (vd.symbol != null && vd.symbol != NoSymbol)
                      x => x.symbol == vd.symbol
                    else {
                      case Ident(m: TermName) => m == name
                      case _ => false
                    }
                  subs = (matcher, rhs) :: subs
                  Nil
                case r => List(treeCopy.ValDef(vd, mods, name, tpt, r))
              }
            case st => List(transform(st))
          }
          val newExpr = transform(expr)
          subs = saved
          if (kept.isEmpty) newExpr else treeCopy.Block(t, kept, newExpr)
        case _ => super.transform(t)
      }
    }
    tr.transform(body)
  }

  /** TYPED validation of one groupBy-comprehension body (the yield, or a
    * guard condition) under its Group binder symbol: every reference to
    * the binder must be `<g>.key` or the root of a collected fold whose
    * stage lambdas / fold argument do not re-capture the binder, and no
    * distributed bag may be referenced. Block-level aliases of
    * `<g>.values`/`<g>.key` inline first ([[inlineGroupAliases]]).
    * Returns the collected folds, or None when the body is not fusible
    * (callers fall back to the unfused groupBy — correct, just
    * group-materializing). */
  private def groupFoldsOf(sym: Symbol, rawBody: Tree): Option[List[GroupFoldOcc]] = {
    val body = inlineGroupAliases(rawBody,
      { case i: Ident => i.symbol == sym; case _ => false })
    val isRootT: Tree => Boolean = {
      case Select(i @ Ident(_), TermName("values")) => i.symbol == sym
      case _ => false
    }
    val folds = collectGroupFolds(body, isRootT)
    def usesG(t: Tree): Boolean =
      t.exists { case i: Ident => i.symbol == sym; case _ => false }
    def restOk(t: Tree): Boolean = t match {
      case _ if folds.exists(_._1 eq t) => true
      case Select(i @ Ident(_), TermName("key")) if i.symbol == sym => true
      case i @ Ident(_) if i.symbol == sym => false
      case _ => t.children.forall(restOk)
    }
    val ok = distributedValueRef(body).isEmpty && restOk(body) &&
      folds.forall { case (_, st, _, arg) =>
        st.forall(s => !usesG(s._2)) && arg.forall(a => !usesG(a))
      }
    if (ok) Some(folds) else None
  }

  /** The algebra tree for one fold occurrence, plus the conversion the
    * substituted accessor needs: Seq.size/count are Int where the algebra
    * yields Long; Seq.min/max are total where the algebra yields Option —
    * groups are never empty, but a fused filter stage CAN empty one, so
    * the miss raises the same UnsupportedOperationException the unfused
    * Seq spelling would. */
  private def groupFoldAlg(occ: GroupFoldOcc): (Tree, Tree => Tree) = {
    val (_, stages, kind, arg) = occ
    def emptyMinMax(t: Tree): Tree =
      q"""$t.getOrElse(throw new _root_.java.lang.UnsupportedOperationException(
            ${Literal(Constant("empty." + kind.toString))}))"""
    val base: (Tree, Tree => Tree) = kind match {
      case TermName("size") => (q"_root_.graft.api.alg.Size", t => q"$t.toInt")
      case TermName("count") =>
        (q"_root_.graft.api.alg.Count(${arg.get})", t => q"$t.toInt")
      case TermName("sum") => (q"_root_.graft.api.alg.Sum(${arg.get})", identity)
      case TermName("product") => (q"_root_.graft.api.alg.Product(${arg.get})", identity)
      case TermName("min") => (q"_root_.graft.api.alg.Min(${arg.get})", emptyMinMax)
      case TermName("max") => (q"_root_.graft.api.alg.Max(${arg.get})", emptyMinMax)
      case TermName("exists") => (q"_root_.graft.api.alg.Exists(${arg.get})", identity)
      case TermName("forall") => (q"_root_.graft.api.alg.Forall(${arg.get})", identity)
      case other => c.abort(c.enclosingPosition, s"internal: unknown group fold $other")
    }
    val alg = stages.foldRight(base._1) {
      case ((TermName("filter"), p), inner) => q"_root_.graft.api.alg.WithFilterAlg($p, $inner)"
      case ((TermName("map"), f), inner) => q"_root_.graft.api.alg.MapAlg($f, $inner)"
      case ((other, _), _) =>
        c.abort(c.enclosingPosition, s"internal: unknown group fold stage $other")
    }
    (alg, base._2)
  }

  /** Accessor into the right-nested Alg2 value tuple for fold j of n. */
  private def groupFoldAccessor(base: Tree, j: Int, n: Int,
      conv: Tree => Tree): Tree = {
    val downs = (1 to j).foldLeft(base)((t, _) => q"$t._2")
    val slot = if (j == n - 1) downs else q"$downs._1"
    conv(slot)
  }

  /** TYPED fusibility of a whole groupBy comprehension: the generator is
    * `xs.groupBy(k)` over a distributed bag with plain binders, and the
    * yield + every guard validate under [[groupFoldsOf]] with at least
    * one fold somewhere. Returns (body folds, per-guard folds). */
  private def groupFusionOf(gen: Gen, tbody: Tree)
      : Option[(List[GroupFoldOcc], List[List[GroupFoldOcc]])] = gen.bag match {
    case Call1(xs, TermName("groupBy"), _)
        if isDataBag(xs) && gen.pat.isEmpty && gen.guards.forall(_.pat.isEmpty) =>
      val bodyFolds = groupFoldsOf(gen.v.symbol, tbody)
      val gfs = gen.guards.map(gd => groupFoldsOf(gd.v.symbol, gd.cond))
      if (bodyFolds.isDefined && gfs.forall(_.isDefined) &&
          (bodyFolds.get.nonEmpty || gfs.exists(_.get.nonEmpty)))
        Some((bodyFolds.get, gfs.map(_.get)))
      else None
    case _ => None
  }

  private def abortBagHead(r: Tree): Nothing =
    c.abort(c.enclosingPosition,
      s"onSpark: the yield references the distributed bag '$r'; derived head shapes are " +
      "a nested comprehension over a literal DataBag(seq) (runs locally per element) " +
      "and a correlated monoid fold — `bag.withFilter(y => key(y) == key(vars))" +
      "[.map(v)].sum/.min/.max` / `.size` / `bag.count(y => key == key [&& p(y)])` " +
      "(pre-aggregated and joined); generator-INDEPENDENT folds hoist into driver vals " +
      "automatically — fold the bag outside the comprehension or restructure")

  private def abortBagGuard(r: Tree): Nothing =
    c.abort(c.enclosingPosition,
      s"onSpark: a guard references the distributed bag '$r'; derived guard shapes are " +
      "`bag.exists(y => key(y) == key(vars) [&& p(y) ...])` / its negation / " +
      "`bag.withFilter(...).nonEmpty` / `.isEmpty` / " +
      "`bag.forall(y => key(y) != key(vars))` (semi/anti joins) and comparisons of " +
      "correlated monoid folds `bag.count(y => key == key [&& p]) <op> e` " +
      "(pre-aggregate + join + filter) — restructure the guard or join explicitly")

  // --------------------------------- uncorrelated global folds (hoisting)

  private val globalFoldNames: Set[TermName] =
    Set("min", "max", "minBy", "maxBy", "product", "nonEmpty", "isEmpty",
      "find", "reduce", "reduceOption", "fold", "foldAll", "sample")
      .map(TermName(_))

  /** Shape anchor for a scalar fold / quantifier / emptiness call at the
    * end of a bag chain: returns the receiver. Shape-only — matches typed
    * and untyped trees identically (the positional-replay contract). */
  private object GlobalAnchor {
    def unapply(t: Tree): Option[Tree] = t match {
      case FoldCall(q, _, _) => Some(q)
      case QuantCall(b, _, _, _, _, _) => Some(b)
      case Select(q, n: TermName) if globalFoldNames(n) => Some(q)
      case Apply(Select(q, n: TermName), _) if globalFoldNames(n) => Some(q)
      case Apply(TypeApply(Select(q, n: TermName), _), _) if globalFoldNames(n) => Some(q)
      case Apply(Apply(Select(q, n: TermName), _), _) if globalFoldNames(n) => Some(q)
      case Apply(Apply(TypeApply(Select(q, n: TermName), _), _), _) if globalFoldNames(n) =>
        Some(q)
      case _ => None
    }
  }

  /** Every symbol DEFINED anywhere inside `t` (generator/guard lambda
    * params, pattern binds, local vals in the yield, nested-comprehension
    * binders). */
  private def defSymsIn(t: Tree): Set[Symbol] = {
    val b = Set.newBuilder[Symbol]
    t.foreach {
      case d: DefTree if d.symbol != null && d.symbol != NoSymbol => b += d.symbol
      case _ => ()
    }
    b.result()
  }

  /** Preorder anchor decisions on the TYPED tree: `true` = this anchor is
    * a scalar fold of a distributed bag that references NO symbol bound
    * elsewhere in the comprehension — its value is one constant for the
    * whole pipeline, so it hoists into a driver `val` (SQL's uncorrelated
    * scalar subquery). Qualified anchors are not descended into;
    * unqualified ones are (a hoistable fold may hide inside, e.g. the
    * inner `ys.size` of a correlated `minBy(y => f(y, ys.size))`). */
  private def globalFoldDecisions(expr: Tree): List[Boolean] = {
    val allDefs = defSymsIn(expr)
    val out = scala.collection.mutable.ListBuffer.empty[Boolean]
    val trav = new Traverser {
      override def traverse(t: Tree): Unit = t match {
        case GlobalAnchor(recv) =>
          val boundOutside = (allDefs -- defSymsIn(t)).toSeq
          val ok = isDataBag(recv) && !isDataBag(t) &&
            distributedValueRef(t).isDefined &&
            !t.exists(isLocalBagCtor) && !usesAny(t, boundOutside)
          out += ok
          if (!ok) super.traverse(t)
        case _ => super.traverse(t)
      }
    }
    trav.traverse(expr)
    out.toList
  }

  /** Fold spellings that route through `AutoCache.foldThrough` inside a
    * scope — safe for the [[deferNamed]] collect/read protocol (running the
    * spelling twice costs zero extra jobs: the queue insert in collect
    * mode, memo hits on the read). `count/exists/forall/find/sample/
    * isEmpty/nonEmpty/collect/foldAll` run direct Spark actions and must
    * stay eager (a collect-mode run would execute the job AND the read
    * would run it again). */
  private val deferableFoldNames: Set[TermName] =
    Set("sum", "size", "min", "max", "product", "top", "bottom",
      "reduce", "reduceOption", "minBy", "maxBy", "fold")
      .map(TermName(_))

  @annotation.tailrec
  private def anchorKind(t: Tree): Option[TermName] = t match {
    case Select(_, n: TermName) => Some(n)
    case Apply(f, _) => anchorKind(f)
    case TypeApply(f, _) => anchorKind(f)
    case _ => None
  }

  /** Hoists every generator-independent fold of a distributed bag out of
    * the comprehension into a driver `val` and re-expands `onSpark` on the
    * rewritten comprehension, where the fold value is now a plain local and
    * the remaining shape derives as usual. Without the hoist the fold's bag
    * would ride an executor-side closure (a guaranteed runtime crash) or
    * abort.
    *
    * Fold-ROUTED spellings emit through [[graft.api.AutoCache.deferNamed]]:
    * inside an active `AutoCache.scope` all hoisted folds of one bag queue
    * FIRST and execute as ONE fused `foldAll` at the first read (the
    * reference's FoldForestFusion on the uncorrelated-scalar hoist);
    * outside a scope the thunk runs once eagerly — the exact `val` it
    * replaces. Direct-action spellings (count/exists/sample/...) keep plain
    * eager vals. Hoisted folds are mutually independent by construction, so
    * the queue-then-read reordering is unobservable. Returns None when
    * nothing qualifies. */
  private def hoistGlobalFolds(expr: Tree): Option[Tree] = {
    val decisions = globalFoldDecisions(expr)
    if (!decisions.contains(true)) return None
    val names = scala.collection.mutable.ListBuffer.empty[TermName]
    val rhss = scala.collection.mutable.ListBuffer.empty[Tree]
    var i = 0
    val tf = new Transformer {
      override def transform(t: Tree): Tree = t match {
        case GlobalAnchor(_) =>
          val d = i < decisions.length && decisions(i)
          i += 1
          if (d) {
            val n = TermName(c.freshName("glob$"))
            names += n
            rhss += t
            Ident(n)
          } else super.transform(t)
        case _ => super.transform(t)
      }
    }
    val rewritten = tf.transform(c.untypecheck(expr))
    if (i != decisions.length || names.isEmpty)
      c.abort(c.enclosingPosition,
        "internal: global fold occurrences changed after untypecheck")
    val deferable = rhss.toList.map(r => anchorKind(r).exists(deferableFoldNames))
    val handles = names.toList.zip(rhss.toList).zip(deferable).map {
      case ((n, r), true) =>
        q"val ${TermName(n.toString + "$h")} = _root_.graft.api.AutoCache.deferNamed(() => $r)"
      case ((n, r), false) => q"val $n = $r"
    }
    val reads = names.toList.zip(deferable).collect { case (n, true) =>
      q"val $n = ${TermName(n.toString + "$h")}.apply()"
    }
    val block = q"{ ..$handles; ..$reads; _root_.graft.api.comprehensions.onSpark($rewritten) }"
    // The reference runs fold-fusion unconditionally (SparkCompiler.scala:
    // 36-39 pipelines foldForestFusion + addCacheCalls on every quoted
    // program); mirror that by self-establishing the fusion scope around
    // the hoist block whenever a fold-routed spelling hoisted. At runtime
    // `scopeIfInactive` is a pass-through inside an existing scope, so an
    // explicit user `AutoCache.scope` (or an enclosing expansion's own
    // wrapper) still owns the batch/memo state and composes across sibling
    // pipelines; only a BARE pipeline gains the scope — and with it the
    // one-fused-foldAll plan instead of one job per hoisted fold.
    Some(
      if (deferable.contains(true))
        q"_root_.graft.api.AutoCache.scopeIfInactive($block)"
      else block)
  }

  // ------------------- same-object helper-def inlining (reference Lib.expand)
  //
  // The reference inlines `@emma.lib` function bodies into quoted programs
  // before deriving (compiler/lib/Lib.scala:40-55: beta reduction + cycle
  // check over a registry of method ASTs), so a helper `def` that builds a
  // bag from a row still participates in join derivation. There is no
  // cross-file AST registry here; the equivalent scope is the SAME-OBJECT
  // def — any method whose owner sits on the macro call site's own owner
  // chain (enclosing object/class/method), whose DefDef tree is findable in
  // the current compilation unit. That is exactly the def whose body can
  // splice at the call site with every free reference still resolvable.

  /** Owner chain of the macro call site, as a set (enclosing method, class,
    * object, package — the scopes whose defs are safely splicable here). */
  private def callSiteOwners: Set[Symbol] = {
    val b = Set.newBuilder[Symbol]
    var s = c.internal.enclosingOwner
    while (s != null && s != NoSymbol) { b += s; s = s.owner }
    b.result()
  }

  /** TYPED-side: a call `m(args)` / `this.m(args)` / `Obj.m(args)` to a
    * method owned by an enclosing scope. Returns the method symbol. */
  private def sameObjectDefCall(t: Tree): Option[MethodSymbol] = {
    @annotation.tailrec
    def peel(f: Tree, seenArgs: Boolean): Option[MethodSymbol] = f match {
      case Apply(g, _) => peel(g, seenArgs = true)
      case TypeApply(g, _) => peel(g, seenArgs)
      case _ =>
        val shapeOk = f match {
          case _: Ident => true
          case Select(_: This, _) => true
          case Select(q, _) => q.symbol != null && q.symbol.isModule
          case _ => false
        }
        if (seenArgs && shapeOk && f.symbol != null && f.symbol != NoSymbol &&
            f.symbol.isMethod && callSiteOwners(f.symbol.owner))
          Some(f.symbol.asMethod)
        else None
    }
    peel(t, seenArgs = false)
  }

  private def returnsDataBag(m: MethodSymbol): Boolean =
    m.returnType.baseClasses.exists(_.fullName == "graft.api.DataBag")

  /** A SCALAR-returning def that CONSUMES DataBag parameters — the
    * reference's dominant library shape (`stat.sum/min/max(D)(xs:
    * DataBag[DVector]): DVector`, emma-lib/.../stats/stat.scala:27-35; the
    * sgd losses, the eval metrics) which `Lib.expand` inlines like any
    * other annotated def (compiler/lib/Lib.scala:49-51 matches ANY
    * carrier-bearing DefCall regardless of return type). */
  private def consumesBagParam(m: MethodSymbol): Boolean =
    scala.util.Try(m.paramLists.exists(_.exists(p =>
      p.info.baseClasses.exists(_.fullName == "graft.api.DataBag"))))
      .getOrElse(false)

  /** Guard/yield splice eligibility: bag-returning defs (join derivation)
    * and scalar bag consumers (their folds then reach the correlated-fold
    * / global-hoist machinery). A call to either shape over a distributed
    * bag is an abort today without the splice, so widening this gate can
    * only turn aborts into derivations. Scalar defs with no bag parameter
    * are plain driver arithmetic — never spliced (their carrier is inert). */
  private def spliceableLib(m: MethodSymbol): Boolean =
    returnsDataBag(m) || consumesBagParam(m)

  /** The DefDef tree for `sym` anywhere in the current compilation unit
    * (symbols are assigned by namer, so defs typed AFTER the call site are
    * still found). Abstract/empty bodies don't qualify. */
  private def findUnitDefDef(sym: Symbol): Option[DefDef] = {
    var found: Option[DefDef] = None
    c.enclosingUnit.body.foreach {
      case dd: DefDef if found.isEmpty && dd.symbol == sym && !dd.rhs.isEmpty =>
        found = Some(dd)
      case _ => ()
    }
    found
  }

  /** Same-object spliceable defs by UNIQUE name — DataBag-returning plus
    * scalar bag CONSUMERS ([[spliceableLib]]) — the registry the untyped
    * recursive pass matches against (untypecheck erases symbols, so
    * nested helper calls inside a spliced body resolve by name). Chain
    * method names are excluded so `xs.map(...)` can never false-match. */
  private lazy val unitBagDefsByName: Map[TermName, DefDef] = {
    val chainNames = Set("map", "flatMap", "withFilter", "filter", "groupBy",
      "union", "distinct", "apply").map(TermName(_))
    val owners = callSiteOwners
    val all = scala.collection.mutable.ListBuffer.empty[DefDef]
    c.enclosingUnit.body.foreach {
      // forcing returnType on a def whose result type is still being
      // INFERRED elsewhere in the unit can cycle — Try skips those (they
      // could not be splice candidates reliably anyway)
      case dd: DefDef if dd.symbol != null && dd.symbol != NoSymbol &&
          dd.symbol.isMethod && owners(dd.symbol.owner) && !dd.rhs.isEmpty &&
          !chainNames(dd.name) &&
          scala.util.Try(spliceableLib(dd.symbol.asMethod)).getOrElse(false) =>
        all += dd
      case _ => ()
    }
    all.groupBy(_.name).collect { case (n, ds) if ds.length == 1 => (n, ds.head) }
  }

  /** UNTYPED-side: peel a call into (name, argss) — unqualified or
    * this-qualified spellings only (the recursive pass; the typed entry
    * already adjudicated module-qualified calls by symbol). */
  private def peelNameCallU(t: Tree): Option[(TermName, List[List[Tree]])] = {
    @annotation.tailrec
    def peel(f: Tree, argss: List[List[Tree]]): Option[(TermName, List[List[Tree]])] =
      f match {
        case Apply(g, args) => peel(g, args :: argss)
        case TypeApply(g, _) => peel(g, argss)
        case Ident(n: TermName) if argss.nonEmpty => Some((n, argss))
        case Select(_: This, n: TermName) if argss.nonEmpty => Some((n, argss))
        case _ => None
      }
    peel(t, Nil)
  }

  /** Fresh-rename every lambda parameter AND every plain block-local
    * `val` in an UNTYPED spliced body so a helper-internal binder can
    * never collide with a binder at the splice site — or with ITS OWN
    * TWIN from another splice of the same helper (two spliced copies of
    * `variance`'s `val mu = ...` body in one yield otherwise bind the
    * same name, and the second binder poisons the ANF-inverse pass's
    * count-verified substitution, r15). The reference's betaReduce
    * renames every non-parameter binding the same way (Lib.scala
    * bndDefsSubstSeq). A rename that would mis-capture (inner shadowing
    * poisons the substitution) leaves that binding's own name in place —
    * a residual collision then surfaces as the derivation abort, never a
    * silent mis-binding. */
  private def alphaRenameBinders(t: Tree): Tree = {
    def plainVal(vd: ValDef): Boolean =
      !vd.mods.hasFlag(Flag.PARAM) && !vd.mods.hasFlag(Flag.MUTABLE) &&
        !vd.mods.hasFlag(Flag.LAZY) && vd.rhs.nonEmpty
    val tr = new Transformer {
      override def transform(x: Tree): Tree = x match {
        case fn @ Function(params, body) =>
          var b = body
          var ok = true
          val nps = params.map { p =>
            if (!ok) p
            else {
              val f = TermName(c.freshName(p.name.toString))
              val (nb, cnt) = substFreeName(b, p.name, Ident(f))
              if (cnt < 0) { ok = false; p }
              else { b = nb; ValDef(p.mods, f, p.tpt, p.rhs) }
            }
          }
          if (!ok) super.transform(fn)
          else treeCopy.Function(fn, nps, transform(b))
        case blk @ Block(stats, _)
            if stats.exists { case vd: ValDef => plainVal(vd); case _ => false } =>
          // rename each plain val and substitute the fresh name through
          // the REMAINDER of the block (later stats + result expr) — one
          // sequential pass, declining the rest on any poisoned
          // substitution; then recurse into the rewritten block's children
          // (super.transform never re-matches the block node itself)
          var rest: List[Tree] = blk.children
          val out = scala.collection.mutable.ListBuffer.empty[Tree]
          var ok = true
          while (rest.nonEmpty) {
            rest.head match {
              case vd: ValDef if ok && plainVal(vd) =>
                val f = TermName(c.freshName(vd.name.toString))
                var good = true
                val subbed = rest.tail.map { s =>
                  if (!good) s
                  else {
                    val (ns, cnt) = substFreeName(s, vd.name, Ident(f))
                    if (cnt < 0) { good = false; s } else ns
                  }
                }
                if (!good) { ok = false; out += vd; rest = rest.tail }
                else {
                  out += ValDef(vd.mods, f, vd.tpt, vd.rhs)
                  rest = subbed
                }
              case other =>
                out += other
                rest = rest.tail
            }
          }
          val all = out.toList
          super.transform(treeCopy.Block(blk, all.init, all.last))
        case _ => super.transform(x)
      }
    }
    tr.transform(t)
  }

  /** Beta-reduce one helper call: substitute each argument for its
    * parameter, splice the untypechecked body, then recursively inline
    * nested same-object helper calls with a cycle check (the reference's
    * ensureAcyclic, Lib.scala:57-58). */
  private def betaReduceU(dd: DefDef, argssU: List[List[Tree]],
      trace: List[Symbol], spliceBound: Set[TermName]): Tree =
    betaReduceSym(dd.symbol, dd, argssU, trace, spliceBound,
      bareRegistry = true)

  /** [[betaReduceU]] generalized over the helper's identity: `sym` is the
    * method symbol used for the cycle check (same-unit defs carry it on
    * the DefDef; cross-file @lib defs supply the TYPED call's resolved
    * symbol because their parsed trees have none), and `bareRegistry`
    * gates whether bare-name calls inside the spliced body may match the
    * same-unit registry (never for PARSED cross-file bodies — their bare
    * names belong to the DEFINING file's scope, and the qualification
    * pass has already rewritten every same-object sibling call). */
  private def betaReduceSym(sym: Symbol, dd: DefDef, argssU: List[List[Tree]],
      trace: List[Symbol], spliceBound: Set[TermName],
      bareRegistry: Boolean): Tree = {
    if (trace.contains(sym))
      c.abort(c.enclosingPosition,
        s"onSpark: cyclic helper-def calls while inlining: " +
        (sym :: trace).reverse.map(_.name).mkString(" -> ") +
        " — recursive bag-building defs are not derived; restructure or join explicitly")
    if (dd.tparams.nonEmpty)
      c.abort(c.enclosingPosition,
        s"onSpark: helper def '${dd.name}' has type parameters — not inlined; " +
        "monomorphize the helper or join explicitly")
    val params = dd.vparamss.flatten
    val args = argssU.flatten
    if (params.length != args.length)
      c.abort(c.enclosingPosition,
        s"onSpark: helper def '${dd.name}' arity mismatch while inlining " +
        s"(${params.length} parameters, ${args.length} arguments) — " +
        "supply every argument list explicitly or join explicitly")
    // free references to the helper's ENCLOSING-METHOD locals survive
    // untypecheck as bare Idents and re-resolve BY NAME at the splice site;
    // a comprehension binder or splice-site local sharing such a name would
    // capture the reference silently — abort instead (the poison-and-
    // decline discipline substFreeName already applies to parameters).
    // Symbol-precise on the TYPED DefDef: a bare Ident whose symbol is not
    // defined inside the def is an external local (object members render
    // qualified as `O.this.x` in typed trees and survive intact).
    val extLocals = externalLocalNames(dd)
    val clash = extLocals.intersect(spliceBound)
    if (clash.nonEmpty)
      c.abort(c.enclosingPosition,
        s"onSpark: helper def '${dd.name}' reads enclosing-scope local(s) " +
        s"${clash.mkString(", ")} whose name collides with a binder at the " +
        "splice site — not inlined (the spliced reference would re-resolve " +
        "to the binder); rename the local or the binder")
    // HIGHER-ORDER parameters over bags — the reference's summarize shape
    // (summarize.scala:22-67, function-valued statistic params applied to
    // the bag inside the body): the argument must be a function LITERAL
    // (an explicit lambda, or what eta-expansion / auto-eta of an @lib
    // member leaves after untypecheck) so the application beta-reduces
    // below and the statistic's folds reach the hoist/fusion machinery.
    // An OPAQUE runtime function value cannot splice — its application to
    // the distributed bag would ride the emitted closure — so it aborts
    // with guidance (the reference's Lib.expand has the whole lambda in
    // its IR and never faces this case).
    params.zip(args).foreach { case (p, a) =>
      if (fnParamOverBag(p) && stripFnLiteral(a).isEmpty)
        c.abort(c.enclosingPosition,
          s"onSpark: helper def '${dd.name}' takes the function-valued " +
          s"parameter '${p.name}' over a DataBag, and the argument is an " +
          "opaque runtime value — pass a function literal (`zs => ...`) or " +
          "an (eta-expanded) @lib member (`dstat.meanL _`) so the " +
          "statistic can inline and its folds fuse; an opaque function " +
          "applied to a distributed bag inside the quote cannot derive")
    }
    // arguments substitute DIRECTLY for their parameters (no prefix vals: a
    // Block-wrapped bag would defeat the unnester downstream). Evaluation
    // moves from call-time to use-time and duplicates per occurrence — the
    // same purity premise every other derivation step (guard reordering into
    // join keys, fold hoisting) already assumes for quoted expressions.
    // Substitution is TWO-PHASE so it behaves as one SIMULTANEOUS pass:
    // every parameter first alpha-renames to a fresh name, THEN arguments
    // substitute for the fresh names. A sequential direct substitution
    // would let an argument whose free identifiers include a LATER
    // parameter's name be rewritten by that parameter's substitution
    // (`h(hi, lo)` against `def h(lo, hi)` reading both as the call-site
    // `lo`) — the reference's Lib.betaReduce avoids the same trap by
    // binding each argument to a fresh symbol first.
    var body = alphaRenameBinders(c.untypecheck(dd.rhs.duplicate))
    val freshParams = params.map(p => TermName(c.freshName(p.name.toString)))
    params.zip(freshParams).foreach { case (p, f) =>
      val (nb, cnt) = substFreeName(body, p.name, Ident(f))
      if (cnt < 0)
        c.abort(c.enclosingPosition,
          s"onSpark: helper def '${dd.name}' shadows its parameter '${p.name}' " +
          "inside its body — not inlined; rename the inner binder")
      body = nb
    }
    freshParams.zip(args).foreach { case (f, a) =>
      // fresh names cannot be rebound inside body, so this never poisons
      val (nb, _) = substFreeName(body, f, a)
      body = nb
    }
    // immediate applications of substituted function literals reduce NOW,
    // before nested-call inlining: `s1(xs)` with a lambda substituted for
    // `s1` becomes the lambda body over `xs`, whose own @lib calls then
    // inline in the same pass (the reference's Lib.expand beta reduction)
    body = betaReduceLiteralApps(body)
    dropIdentityMaps(inlineCallsU(body, sym :: trace,
      spliceBound = spliceBound ++ boundNamesIn(body),
      bareRegistry = bareRegistry))
  }

  /** A function LITERAL under the wrappers the typer/untypecheck leave on
    * eta-expansions and ascriptions: `f _` untypechecks to a (possibly
    * Block- or Typed-wrapped) `Function`, auto-eta of a method value
    * likewise. Returns the literal when the tree is one. */
  @annotation.tailrec
  private def stripFnLiteral(t: Tree): Option[Function] = t match {
    case f: Function => Some(f)
    case Typed(inner, _) => stripFnLiteral(inner)
    case Block(Nil, inner) => stripFnLiteral(inner)
    case _ => None
  }

  /** A function-typed parameter whose DOMAIN mentions DataBag — the
    * reference's higher-order library shape (`summarize.apply(s1:
    * DataBag[DVector] => B1, ...)`, emma-lib/.../stats/summarize.scala:
    * 22-67). Textual on the tpt: registry bodies are PARSED (no types),
    * and monomorphized tpts render their concrete types — both spell
    * `DataBag` and an arrow/Function type visibly. Used only to decide
    * the opaque-argument ABORT (a function literal beta-reduces
    * regardless), so a false negative merely defers the failure to the
    * downstream captured-bag abort — never a silent mis-binding. */
  private def fnParamOverBag(p: ValDef): Boolean = {
    val s = showCode(p.tpt)
    s.contains("DataBag") && (s.contains("=>") || s.contains("Function"))
  }

  /** Beta-reduce immediate applications of function LITERALS — the
    * reference's Lib.expand beta reduction (compiler/lib/Lib.scala:49-55)
    * that turns a spliced `summarize` body's `s1(xs)` — after the
    * function-literal argument substituted for `s1` — into the passed
    * statistic's direct call, so its folds reach the hoist/fusion
    * machinery. Same two-phase fresh-rename discipline as
    * [[betaReduceSym]]; a poisoned substitution DECLINES the reduction
    * (the residual immediate application is still-correct driver code or
    * surfaces as the downstream derivation abort — never a silent
    * mis-binding). */
  private def betaReduceLiteralApps(t: Tree): Tree = {
    val tr = new Transformer {
      override def transform(x: Tree): Tree = x match {
        case Apply(fn, args) =>
          stripFnLiteral(fn) match {
            case Some(Function(ps, fb)) if ps.length == args.length &&
                ps.forall(_.rhs.isEmpty) =>
              var body = fb
              var ok = true
              val fresh = ps.map(p => TermName(c.freshName(p.name.toString)))
              ps.zip(fresh).foreach { case (p, f) =>
                if (ok) {
                  val (nb, cnt) = substFreeName(body, p.name, Ident(f))
                  if (cnt < 0) ok = false else body = nb
                }
              }
              if (!ok) super.transform(x)
              else {
                fresh.zip(args).foreach { case (f, a) =>
                  val (nb, _) = substFreeName(body, f, a.duplicate)
                  body = nb
                }
                // re-scan the reduced body: nested literal applications
                // (a statistic that itself received a function) reduce too
                transform(body)
              }
            case _ => super.transform(x)
          }
        case _ => super.transform(x)
      }
    }
    tr.transform(t)
  }

  /** Drop identity `.map(y => y)` stages — what a helper body's
    * `yield <binder>` desugars to. Without this a spliced nested helper
    * leaves `root.withFilter(f1).map(id).withFilter(f2)` chains whose
    * guard-over-a-mapped-binder shape the unnester's walker declines;
    * with it the guards stack directly on the root. Matches both the
    * bare call and the implicit-arg (encoder) Apply layer. */
  private def dropIdentityMaps(t: Tree): Tree = {
    object IdMap {
      def unapply(x: Tree): Option[Tree] = x match {
        case Apply(Select(recv, TermName("map")),
            List(Function(List(p), Ident(n)))) if n == p.name => Some(recv)
        case Apply(Apply(Select(recv, TermName("map")),
            List(Function(List(p), Ident(n)))), _) if n == p.name => Some(recv)
        case _ => None
      }
    }
    val tr = new Transformer {
      override def transform(x: Tree): Tree = x match {
        case IdMap(recv) => transform(recv)
        case _ => super.transform(x)
      }
    }
    tr.transform(t)
  }

  /** Names of bare-Ident references in `dd.rhs` whose symbol is NOT
    * defined inside the def itself — the helper's external METHOD-LOCAL
    * references (typed-tree, symbol-precise: object-member reads render
    * as `O.this.x` Selects in typed trees and are excluded by shape). */
  private def externalLocalNames(dd: DefDef): Set[TermName] = {
    val internal: Set[Symbol] = {
      val b = Set.newBuilder[Symbol]
      dd.foreach {
        case d: DefTree if d.symbol != null && d.symbol != NoSymbol =>
          b += d.symbol
        case _ => ()
      }
      b.result()
    }
    val b = Set.newBuilder[TermName]
    dd.rhs.foreach {
      case i @ Ident(n: TermName)
          if i.symbol != null && i.symbol != NoSymbol && i.symbol.isTerm &&
            !internal(i.symbol) && i.symbol.owner != null &&
            i.symbol.owner.isMethod =>
        b += n
      case _ => ()
    }
    b.result()
  }

  /** Mutable hit counter for [[inlineCallsU]] callers that must know
    * whether anything was rewritten. */
  private final class InlineHits { var n: Int = 0 }

  /** Recursively inline same-object helper calls in an UNTYPED tree (the
    * body of an already-spliced helper, or a guard/yield position), matched
    * by unique name. Untyped
    * trees carry no symbols, so LOCAL definitions and lambda params that
    * shadow a registry name suspend that name for their subtree — a
    * shadowed call must never rewrite to the object-level helper's body. */
  private def inlineCallsU(t: Tree, trace: List[Symbol],
      hits: InlineHits = new InlineHits,
      // when set, only these names inline (the TYPED-side symbol-verified
      // calls of a guard/yield position — an imported function sharing a
      // registry name must never splice the registry body); None inside
      // spliced helper bodies, whose unqualified calls are same-object
      only: Option[Set[TermName]] = None,
      // binder names in scope at the splice destination (poison set for
      // the external-local recapture check in betaReduceU)
      spliceBound: Set[TermName] = Set.empty,
      // false inside PARSED cross-file bodies: their bare names resolve in
      // the DEFINING file's scope, never against this unit's registry
      bareRegistry: Boolean = true): Tree = {
    val tr = new Transformer {
      private var shadowed: Set[TermName] = Set.empty
      private var allShadowed: Boolean = false
      private def withShadow[T](names: Iterable[TermName])(f: => T): T = {
        val add = names.filter(unitBagDefsByName.contains).toSet
        if (add.isEmpty) f
        else {
          val saved = shadowed
          shadowed ++= add
          try f finally shadowed = saved
        }
      }
      private def withAllShadowed[T](f: => T): T = {
        val saved = allShadowed
        allShadowed = true
        try f finally allShadowed = saved
      }
      /** Term names an Import statement can BIND at its site: the selector
        * names (post-rename). A WILDCARD selector can bind anything →
        * None (shadow every registry name). */
      private def importBinds(sels: List[ImportSelector]): Option[List[TermName]] =
        if (sels.exists(s => s.name == termNames.WILDCARD || s.name == null))
          None
        else Some(sels.flatMap { s =>
          val n = if (s.rename != null) s.rename else s.name
          n match { case tn: TermName => Some(tn); case _ => None }
        })
      override def transform(x: Tree): Tree = x match {
        case b @ Block(stats, _) =>
          val defined = stats.collect {
            case dd: DefDef => dd.name
            case vd: ValDef => vd.name
          }
          // an Import statement shadows the names it can bind for the rest
          // of the block (conservatively: the WHOLE block — a shadowed call
          // must never rewrite to the registry body); a wildcard import can
          // bind ANY name, so it suspends every registry name
          val importNames = stats.collect { case Import(_, sels) => sels }
            .map(importBinds)
          if (importNames.exists(_.isEmpty)) withAllShadowed(defaultTransform(b))
          else withShadow(defined ++ importNames.flatten.flatten)(defaultTransform(b))
        case fn @ Function(params, _) =>
          withShadow(params.map(_.name))(defaultTransform(fn))
        case _ => defaultTransform(x)
      }
      private def defaultTransform(x: Tree): Tree = peelNameCallU(x) match {
        case Some((n, argss))
            if bareRegistry && !allShadowed && unitBagDefsByName.contains(n) &&
              !shadowed(n) && only.forall(_(n)) =>
          hits.n += 1
          betaReduceU(unitBagDefsByName(n), argss.map(_.map(transform)), trace,
            spliceBound)
        case _ => peelQualCallU(x) match {
          // QUALIFIED call to a cross-file @lib def (resolution verifies
          // the qualifier typechecks to a static module whose member
          // carries @graftSrc, so name shadowing and the `only` allowlist
          // do not apply — the binding is symbol-verified, not name-based)
          case Some((qual, n, targsU, argss)) =>
            resolveLibCallU(qual, n, targsU, argss, spliceBound) match {
              case Some((m, dd)) if spliceableLib(m) =>
                hits.n += 1
                betaReduceSym(m, dd, argss.map(_.map(transform)), trace,
                  spliceBound, bareRegistry = false)
              case _ => super.transform(x)
            }
          case None => super.transform(x)
        }
      }
    }
    tr.transform(t)
  }

  // ------------------- cross-file @lib helper-def inlining
  //
  // The reference's Lib.expand registry is GLOBAL: any `@emma.lib` def
  // from any file inlines into quoted programs (compiler/lib/Lib.scala:
  // 40-55; the whole emma-lib module ships that way). The graft twin:
  // `@graft.api.lib` stores the def's rendered source (plus the defining
  // unit's imports) in a pickled @graftSrc annotation; here the TYPED
  // call's method symbol leads to that source, which is parsed, its free
  // names re-bound to their definition-site meaning (owner-object decls
  // qualify to the owner's _root_ path; import-covered names qualify
  // through the captured imports; scala/java universe names stay bare),
  // and the result beta-reduces with the same cycle check / alpha-rename
  // / shadow discipline as same-unit helpers. Unresolvable frees ABORT
  // with guidance — never a silent splice-site rebinding.

  /** The (source, defining-unit imports) stored by `@graft.api.lib` on
    * `m`, when present (annotation literals are pickled — readable across
    * files and across compilation runs). */
  private def libSrcOf(m: Symbol): Option[(String, String)] = {
    if (m == null || m == NoSymbol || !m.isMethod) return None
    if (m.owner == null || m.owner == NoSymbol || !m.owner.isModuleClass)
      return None
    m.annotations.collectFirst {
      case ann if ann.tree.tpe != null && ann.tree.tpe.typeSymbol != null &&
          ann.tree.tpe.typeSymbol.fullName == "graft.api.graftSrc" =>
        ann.tree.children.tail match {
          case List(Literal(Constant(s: String)), Literal(Constant(i: String))) =>
            Some((s, i))
          case _ => None
        }
    }.flatten
  }

  /** Owner chain is packages-and-objects only (a def on an instance class
    * cannot splice — there is no static path to its siblings). */
  @annotation.tailrec
  private def staticOwner(s: Symbol): Boolean =
    s == null || s == NoSymbol || s.isPackageClass || s == c.mirror.RootClass ||
      (s.isModuleClass && staticOwner(s.owner))

  /** Parse + qualify cache: @lib resolution is pure per method symbol
    * within one expansion (the splice-site binder check happens later,
    * per call site). Left = abort message. Right = (qualified DefDef,
    * names left BARE — universe/import-bound — which must not collide
    * with splice-site binders). */
  private val libDefCache =
    scala.collection.mutable.Map.empty[Symbol, Either[String, (DefDef, Set[TermName])]]

  private def libDefOf(m: MethodSymbol): Either[String, (DefDef, Set[TermName])] =
    libDefCache.getOrElseUpdate(m, {
      libSrcOf(m) match {
        case None => Left(s"'${m.fullName}' carries no @graft.api.lib source")
        case Some((src, imports)) =>
          if (!staticOwner(m.owner))
            Left(s"@lib def '${m.name}' is not a member of a static object " +
              "(instance-class members have no splice-site path)")
          else scala.util.Try(c.parse(src)).toOption match {
            case Some(dd: DefDef) => qualifyLibDef(m, dd, imports)
            case _ => Left(s"@lib def '${m.name}': stored source failed to re-parse")
          }
      }
    })

  /** Monomorphize a type-parameterized @lib def at the splice site: the
    * reference contract (Lib.expand inlines GENERIC defs — emma-lib
    * kfold.split[A: Meta], transitiveClosure.apply[V: Meta]) re-expressed
    * for parsed cross-file sources. `targs` are the call site's concrete
    * type-argument TREES (typed generator calls recover them from the
    * typer's TypeApply; untyped positions need them written explicitly).
    * Substitutes each tparam's name with its tree everywhere in the def
    * and drops the tparam list; context-bound evidence params (already
    * desugared to implicit params in the stored source) become concrete
    * and re-resolve at the splice site, which re-typechecks the splice.
    * Higher-kinded tparams and body-shadowed tparam names abort. */
  private def monomorphizeLibDef(m: Symbol, dd: DefDef,
      targs: List[Tree]): Either[String, DefDef] = {
    if (dd.tparams.exists(_.tparams.nonEmpty))
      return Left(s"@lib def '${m.name}' has a higher-kinded type " +
        "parameter — not inlined; monomorphize by hand or join explicitly")
    if (targs.length != dd.tparams.length)
      return Left(s"@lib def '${m.name}': ${dd.tparams.length} type " +
        s"parameter(s) but ${targs.length} concrete type argument(s) " +
        "recovered at the call site — write the type arguments explicitly")
    val byName: Map[Name, Tree] = dd.tparams.map(_.name: Name).zip(targs).toMap
    // a body-local type definition shadowing a tparam — or shadowing a
    // name the spliced type-ARGUMENT trees reference — would make the
    // blind substitution capture under it: abort (mirrors the
    // parameter-shadow abort in betaReduceSym)
    val targRefs: Set[Name] =
      targs.flatMap(_.collect { case Ident(tn: TypeName) => tn: Name }).toSet
    // the STABLE PREFIX of a qualified type argument (the `graft` of
    // `graft.CustRow`) is a TERM path rooted at an Ident: a body-local
    // TERM definition (val/def/object/bind) of that root name would make
    // the spliced tree's prefix re-resolve through the local — usually a
    // loud re-typecheck failure, but a stable local with a matching member
    // TYPE would bind silently. Collect the roots and abort on any
    // body-local DefTree defining one.
    val targTermRoots: Set[Name] = {
      @annotation.tailrec
      def root(t: Tree): Option[Name] = t match {
        case Select(q, _) => root(q)
        case Ident(n: TermName) => Some(n: Name)
        case _ => None
      }
      targs.flatMap(_.collect { case s @ Select(_, _) => root(s) }.flatten).toSet
    }
    var shadow: Option[Name] = None
    dd.rhs.foreach {
      case td: TypeDef if byName.contains(td.name) || targRefs(td.name) =>
        if (shadow.isEmpty) shadow = Some(td.name)
      case d: DefTree if targTermRoots(d.name) =>
        if (shadow.isEmpty) shadow = Some(d.name)
      case _ => ()
    }
    if (shadow.isDefined)
      return Left(s"@lib def '${m.name}' defines a local name " +
        s"'${shadow.get}' that shadows a type parameter or a name (or the " +
        "stable prefix of a qualified type) used by the call's type " +
        "arguments — not inlined; rename the inner definition")
    val tr = new Transformer {
      override def transform(x: Tree): Tree = x match {
        case Ident(n: TypeName) if byName.contains(n) => byName(n).duplicate
        case _ => super.transform(x)
      }
    }
    Right(treeCopy.DefDef(dd, dd.mods, dd.name, Nil,
      dd.vparamss.map(_.map(vd => treeCopy.ValDef(vd, vd.mods, vd.name,
        tr.transform(vd.tpt), tr.transform(vd.rhs)))),
      tr.transform(dd.tpt), tr.transform(dd.rhs)))
  }

  /** Render a TYPED type argument as a tree that provably names the SAME
    * type at the splice site (parse its printed form, re-typecheck, and
    * require =:=; retry through dealias). A type that does not round-trip
    * — method-local classes, existentials, splice-shadowed names — is a
    * Left with guidance (never a silently different binding). */
  private def typeArgTree(m: Symbol, tpe: Type): Either[String, Tree] = {
    def probe(s: String): Option[Tree] =
      scala.util.Try {
        // parse in TYPE position (tuple/applied type syntax does not parse
        // as a term) by wrapping in asInstanceOf and unwrapping the targ
        c.parse(s"null.asInstanceOf[$s]") match {
          case TypeApply(Select(_, _), List(tpt)) =>
            val tt = c.typecheck(tpt.duplicate, c.TYPEmode, silent = true)
            if (tt.nonEmpty && tt.tpe != null && tt.tpe =:= tpe) Some(tpt)
            else None
          case _ => None
        }
      }.toOption.flatten
    probe(tpe.toString).orElse(probe(tpe.dealias.toString)) match {
      case Some(t) => Right(t)
      case None => Left(s"@lib def '${m.name}': inferred type argument " +
        s"'$tpe' does not re-resolve to the same type at the splice site " +
        "(method-local, existential, or shadowed) — ascribe a globally " +
        "visible type argument explicitly")
    }
  }

  /** Does `path` (a dot-separated term path) typecheck at the splice
    * site? `asType` probes the path's LAST segment as a type name. */
  private def pathResolves(path: String, asType: Boolean): Boolean =
    scala.util.Try {
      if (asType) {
        val i = path.lastIndexOf('.')
        if (i < 0) c.typecheck(Ident(TypeName(path)), c.TYPEmode, silent = true).nonEmpty
        else {
          val pre = c.parse(path.substring(0, i))
          val tn = TypeName(path.substring(i + 1))
          c.typecheck(tq"$pre.$tn", c.TYPEmode, silent = true).nonEmpty
        }
      } else
        c.typecheck(c.parse(path), c.TERMmode, silent = true).nonEmpty
    }.getOrElse(false)

  /** Re-bind the free names of a PARSED @lib body to their
    * definition-site meaning. Returns the qualified DefDef and the free
    * names left bare (splice-site binder collisions with those abort at
    * reduce time). */
  private def qualifyLibDef(m: MethodSymbol, dd: DefDef,
      importsSrc: String): Either[String, (DefDef, Set[TermName])] = {
    val ownerCls = m.owner
    val ownerPath = "_root_." + ownerCls.fullName
    // the defining unit's imports, re-parsed (order preserved)
    val imps: List[Import] = importsSrc.split('\n').toList.filter(_.nonEmpty)
      .flatMap(s => scala.util.Try(c.parse(s)).toOption.collect { case i: Import => i })
    // enclosing package paths, innermost first (for RELATIVE import
    // prefixes written under the owner's own package)
    val pkgPaths: List[String] = {
      val b = List.newBuilder[String]
      var s = ownerCls.owner
      while (s != null && s != NoSymbol && s != c.mirror.RootClass &&
          s.fullName != "<root>" && s.fullName != "<empty>") {
        if (s.isPackageClass || s.isPackage) b += s.fullName
        s = s.owner
      }
      b.result()
    }
    def stripRoot(p: String): String = p.stripPrefix("_root_.")
    // does some ENCLOSING package of the definition site have a
    // subpackage named `n`? Packages are not values, so the TERM-mode
    // viaOwnPkg probe cannot see them — yet at the definition site such a
    // RELATIVE subpackage outranks any same-named top-level or scala.*
    // package, so the _root_ pinning branches below must not fire
    // (ADVICE r14: `util`, `math` are classic collisions)
    def pkgShadows(n: Name): Boolean =
      pkgPaths.exists(p => scala.util.Try(
        c.mirror.staticPackage(p + "." + n)).isSuccess)
    // resolution memo: name -> Some(full replacement path) | None (bare)
    val memo = scala.collection.mutable.Map.empty[Name, Option[String]]
    val bareFree = scala.collection.mutable.Set.empty[TermName]
    var err: Option[String] = None
    def fail(msg: String): Option[String] = { if (err.isEmpty) err = Some(msg); None }
    def resolveFree(n: Name): Option[String] = memo.getOrElseUpdate(n, {
      val asType = n.isTypeName
      if (ownerCls.info.decl(n) != NoSymbol)
        // own-object member: highest-precedence binding at the definition
        // site (SLS 2 — definitions beat imports), so it qualifies first
        Some(ownerPath + "." + n)
      else {
        // exact import selector (import p.x / import p.{x => y})
        val exact: Option[String] = imps.iterator.flatMap { imp =>
          imp.selectors.iterator.collect {
            case s if s.name != null && s.name != termNames.WILDCARD &&
                (if (s.rename != null) s.rename else s.name).toString == n.toString =>
              stripRoot(showCode(imp.expr)) + "." + s.name.toString
          }
        }.flatMap { cand =>
          (("_root_." + cand) :: pkgPaths.map(p => "_root_." + p + "." + cand))
            .find(pathResolves(_, asType))
        }.take(1).toList.headOption
        val viaImport = exact.orElse {
          // wildcard imports, probed
          imps.iterator.filter(_.selectors.exists(s =>
              s.name == termNames.WILDCARD || s.name == null))
            .flatMap { imp =>
              val pre = stripRoot(showCode(imp.expr))
              (("_root_." + pre + "." + n) ::
                pkgPaths.map(p => "_root_." + p + "." + pre + "." + n))
                .find(pathResolves(_, asType))
            }.take(1).toList.headOption
        }
        // own-package member (no import needed at the definition site)
        val viaOwnPkg = pkgPaths.map(p => "_root_." + p + "." + n)
          .find(pathResolves(_, asType))
        // an import AND a package member both resolving the name to
        // DIFFERENT paths is ambiguous from here: SLS precedence depends
        // on whether the package member was declared in the SAME unit
        // (definitions outrank imports) or another (imports outrank
        // package members from other units) — unknowable at a foreign
        // splice site, so abort instead of picking either
        ((viaImport, viaOwnPkg) match {
          case (Some(ip), Some(op)) if ip != op => fail(
            s"@lib def '${m.name}': free name '$n' resolves BOTH through a " +
            s"captured import ($ip) AND as a member of the defining package " +
            s"($op) — the definition-site binding depends on same-unit " +
            "declaration order, which does not travel; fully qualify " +
            s"'$n' inside the helper body")
          case (some @ Some(_), _) => some
          case (None, other) => other
        }) match {
          case some @ Some(_) => some
          case None if err.nonEmpty => None
          case None =>
            // default scala/java universe: same meaning everywhere — may
            // stay bare (probed at the splice site, which shares it)
            val t = scala.util.Try {
              if (asType) c.typecheck(Ident(n), c.TYPEmode, silent = true)
              else c.typecheck(Ident(n), c.TERMmode, silent = true)
            }.getOrElse(EmptyTree)
            val fn = if (t.nonEmpty && t.symbol != null && t.symbol != NoSymbol)
              t.symbol.fullName else ""
            if (fn.startsWith("scala.") || fn.startsWith("java.") || fn == "scala") {
              n match { case tn: TermName => bareFree += tn; case _ => () }
              None
            } else if (t.nonEmpty && t.symbol != null && t.symbol != NoSymbol &&
                t.symbol.isPackage && t.symbol.owner == c.mirror.RootClass) {
              // root of a fully-qualified path (e.g. `org` in
              // org.apache.spark...): top-level package names are global —
              // pin to _root_ so no splice-site binding can intercept
              Some("_root_." + n)
            } else if (!asType &&
                !imps.exists(_.selectors.exists(s =>
                  s.name != null && s.name != termNames.WILDCARD &&
                    (if (s.rename != null) s.rename else s.name)
                      .toString == n.toString)) &&
                !pkgShadows(n) &&
                scala.util.Try(c.mirror.staticPackage(n.toString)).isSuccess) {
              // root of a fully-qualified path whose package Ident does
              // not typecheck as a TERM (packages are not values — the
              // probe above sees only the cases the typer special-cases):
              // a TOP-LEVEL package name is global, pin to _root_.
              // Guarded on the definition site actually BINDING n there:
              // a RELATIVE subpackage of an enclosing package sharing the
              // name (pkgShadows) outranks the top-level package at the
              // definition site and cannot be term-probed — those keep
              // the fully-qualify abort instead of silently re-binding
              // (ADVICE r14).
              Some("_root_." + n)
            } else if (!asType &&
                !imps.exists(_.selectors.exists(s =>
                  s.name != null && s.name != termNames.WILDCARD &&
                    (if (s.rename != null) s.rename else s.name)
                      .toString == n.toString)) &&
                !pkgShadows(n) &&
                scala.util.Try(c.mirror.staticPackage("scala." + n)).isSuccess) {
              // a scala.* SUB-PACKAGE referenced bare (`math.sqrt` — the
              // reference's own stat.scala spelling): packages are not
              // values, so the TERM-mode probe above cannot see them.
              // Defaulting to the auto-imported scala._ binding is safe
              // only when NO import selector names `n` (an imported
              // package of the same name would outrank scala._ at the
              // definition site and cannot be probed) and NO enclosing
              // package has a same-named subpackage (`util`, `math` as a
              // RELATIVE subpackage would outrank scala._ too — ADVICE
              // r14); both cases keep aborting with the fully-qualify
              // guidance.
              Some("_root_.scala." + n)
            } else fail(
              s"@lib def '${m.name}': free name '$n' is neither a member of " +
              s"${ownerCls.fullName}, nor covered by the defining file's " +
              "imports, nor a scala/java universe name — fully qualify it " +
              "inside the helper body (file-local context does not travel)")
        }
      }
    })
    // scope-aware rewrite (Block binds are over-approximated to the whole
    // block, the same conservative discipline as the registry inliner; a
    // body-internal WILDCARD import travels with the body, so names under
    // it stay bare except own-object decls, which outrank imports)
    val paramNames: Set[Name] =
      dd.vparamss.flatten.map(_.name: Name).toSet ++ dd.tparams.map(_.name: Name)
    def replTree(path: String, asType: Boolean): Tree =
      if (asType) {
        val i = path.lastIndexOf('.')
        val pre = c.parse(path.substring(0, i))
        tq"$pre.${TypeName(path.substring(i + 1))}"
      } else c.parse(path)
    val tr = new Transformer {
      private var bound: Set[Name] = paramNames
      private var importAll: Boolean = false
      private def withBound[T](names: Iterable[Name])(f: => T): T = {
        val saved = bound; bound ++= names
        try f finally bound = saved
      }
      private def withImportAll[T](f: => T): T = {
        val saved = importAll; importAll = true
        try f finally importAll = saved
      }
      private def qualify(n: Name, orig: Tree): Tree =
        if (bound(n) || bound(if (n.isTermName) n.toTypeName else n.toTermName)) orig
        else resolveFree(n) match {
          case Some(path) => replTree(path, n.isTypeName)
          case None => orig
        }
      override def transform(x: Tree): Tree = x match {
        case b @ Block(stats, _) =>
          val defined: List[Name] = stats.flatMap {
            case d: DefTree => List(d.name)
            case _ => Nil
          }
          val impSels = stats.collect { case Import(_, sels) => sels }
          val wildcard = impSels.exists(_.exists(s =>
            s.name == termNames.WILDCARD || s.name == null))
          val named: List[Name] = impSels.flatten.flatMap { s =>
            if (s.name == null || s.name == termNames.WILDCARD) Nil
            else {
              val n = if (s.rename != null) s.rename else s.name
              List(n, if (n.isTermName) n.toTypeName else n.toTermName)
            }
          }
          val body = () => super.transform(b)
          if (wildcard) withBound(defined ++ named)(withImportAll(body()))
          else withBound(defined ++ named)(body())
        case fn @ Function(params, body) =>
          // param TYPES still qualify; the body binds the param names
          val nps = params.map(p => treeCopy.ValDef(p, p.mods, p.name,
            transform(p.tpt), transform(p.rhs)))
          withBound(params.map(_.name: Name))(
            treeCopy.Function(fn, nps, transform(body)))
        case dloc: DefDef =>
          withBound(dloc.vparamss.flatten.map(_.name: Name) ++
              dloc.tparams.map(_.name: Name) ++ List(dloc.name: Name))(
            super.transform(dloc))
        case mt @ Match(sel, cases) =>
          treeCopy.Match(mt, transform(sel), cases.map { cd =>
            withBound(bindNames(cd.pat).map(n => n: Name))(
              treeCopy.CaseDef(cd, transform(cd.pat), transform(cd.guard),
                transform(cd.body)))
          })
        case Select(th: This, n: TermName)
            if ownerCls.info.decl(n) != NoSymbol && th.qual.toString.isEmpty =>
          // `this.sibling` inside an object body → static path
          c.parse(ownerPath + "." + n)
        case i @ Ident(n: TermName) if !importAll || ownerCls.info.decl(n) != NoSymbol =>
          qualify(n, i)
        case i @ Ident(n: TypeName) if !importAll || ownerCls.info.decl(n) != NoSymbol =>
          qualify(n, i)
        case _ => super.transform(x)
      }
    }
    val newRhs = tr.transform(dd.rhs)
    err match {
      case Some(msg) => Left(msg)
      case None => Right((treeCopy.DefDef(dd, dd.mods, dd.name, dd.tparams,
        dd.vparamss, dd.tpt, newRhs), bareFree.toSet))
    }
  }

  /** UNTYPED-side: peel `qual.m[T](args)` (non-This qualifier) into
    * (qualifier, name, explicit targs, argss) — the shape cross-file @lib
    * calls keep through untypecheck and the qualification rewrite. Targs
    * survive only when WRITTEN (typer-inserted TypeApplys lose their
    * trees to untypecheck) — type-parameterized defs in untyped positions
    * therefore require explicit type arguments. */
  private def peelQualCallU(t: Tree)
      : Option[(Tree, TermName, List[Tree], List[List[Tree]])] = {
    @annotation.tailrec
    def peel(f: Tree, targs: List[Tree], argss: List[List[Tree]])
        : Option[(Tree, TermName, List[Tree], List[List[Tree]])] =
      f match {
        case Apply(g, args) => peel(g, targs, args :: argss)
        case TypeApply(g, as) =>
          // a TypeTree with no source (typer-inserted, untypechecked) is
          // not an explicit targ — drop it
          val explicit = as.filter {
            case tt: TypeTree => tt.original != null || tt.tpe != null
            case _ => true
          }
          peel(g, if (explicit.length == as.length) as else Nil, argss)
        case Select(q, n: TermName) if argss.nonEmpty &&
            (q match { case _: This => false; case _ => true }) =>
          Some((q, n, targs, argss))
        case _ => None
      }
    peel(t, Nil, Nil)
  }

  /** Is `t` a pure term path (Idents/Selects only)? Cheap pre-filter
    * before typechecking a qualifier. */
  @annotation.tailrec
  private def isTermPath(t: Tree): Boolean = t match {
    case Ident(_: TermName) => true
    case Select(q, _: TermName) => isTermPath(q)
    case _ => false
  }

  /** Qualifier-resolution cache for the untyped pass (key: rendered
    * qualifier + name + call shape — overload families share qual+name
    * and disambiguate on argument-list arities / type-arg count). */
  private val qualResCache =
    scala.collection.mutable.Map.empty[(String, String, List[Int], Int), Option[MethodSymbol]]

  /** UNTYPED-side cross-file resolution: typecheck the qualifier path; a
    * static module whose member `n` carries @graftSrc resolves to that
    * method. Returns the parsed+qualified DefDef; a stored-but-
    * unqualifiable def ABORTS with its guidance (never silently splices
    * or silently rebinds). */
  private def resolveLibCallU(qual: Tree, n: TermName, targsU: List[Tree],
      argss: List[List[Tree]], spliceBound: Set[TermName]): Option[(MethodSymbol, DefDef)] = {
    if (!isTermPath(qual)) return None
    // OVERLOADED members (the reference's summarize module ships six
    // `apply` overloads, summarize.scala:22-67) disambiguate by call
    // SHAPE: explicit-argument-list arities must match (the typer may
    // have appended inferred implicit lists to argss — accept either),
    // and when the call carries type arguments their count must match.
    // Untyped trees have no types, so shape is the strongest available
    // discriminator; summarize-style overload families differ exactly in
    // first-list arity, which shape decides uniquely.
    def shapeMatches(m: MethodSymbol): Boolean = {
      val got = argss.map(_.length)
      val all = m.paramLists.map(_.length)
      val expl = m.paramLists.filterNot(_.exists(_.isImplicit)).map(_.length)
      (got == all || got == expl) &&
        (targsU.isEmpty || m.typeParams.length == targsU.length)
    }
    val key = (qual.toString, n.toString, argss.map(_.length), targsU.length)
    val mOpt = qualResCache.getOrElseUpdate(key, {
      val qt = scala.util.Try(
        c.typecheck(qual.duplicate, c.TERMmode, silent = true)).getOrElse(EmptyTree)
      val qs = if (qt.nonEmpty) qt.symbol else NoSymbol
      if (qs == null || qs == NoSymbol || !qs.isModule) None
      else {
        val mem0 = qs.asModule.moduleClass.info.member(n)
        // object-apply sugar: `summarize(s1, s2)(xs)` carries the typer's
        // inserted `.apply` in TYPED trees, but untypecheck re-sugars it
        // away — the peeled (qual, n) then lands on the enclosing package
        // and the MODULE itself. When the member is a static module, the
        // call targets its `apply` overloads.
        val mem = if (mem0 != NoSymbol && mem0.isModule)
          mem0.asModule.moduleClass.info.member(TermName("apply"))
        else mem0
        val cands =
          if (mem == NoSymbol) Nil
          else if (mem.isTerm && mem.asTerm.isOverloaded)
            mem.asTerm.alternatives.filter(s =>
              s.isMethod && shapeMatches(s.asMethod))
          else List(mem)
        cands.collectFirst {
          case s if s.isMethod && libSrcOf(s).isDefined => s.asMethod
        }
      }
    })
    mOpt.flatMap { m =>
      libDefOf(m) match {
        case Right((dd0, bare)) =>
          val clash = bare.intersect(spliceBound)
          if (clash.nonEmpty)
            c.abort(c.enclosingPosition,
              s"onSpark: @lib def '${m.name}' uses universe name(s) " +
              s"${clash.mkString(", ")} that collide with a binder at the " +
              "splice site — rename the binder")
          val dd =
            if (dd0.tparams.isEmpty) dd0
            else if (targsU.isEmpty) c.abort(c.enclosingPosition,
              s"onSpark: @lib def '${m.name}' is type-parameterized and " +
              "this (guard/yield or nested) call site carries no explicit " +
              "type arguments after untypecheck — write them explicitly, " +
              s"e.g. ${m.name}[T](...)")
            else monomorphizeLibDef(m, dd0, targsU) match {
              case Right(d) => d
              case Left(msg) => c.abort(c.enclosingPosition, s"onSpark: $msg")
            }
          Some((m, dd))
        case Left(msg) => c.abort(c.enclosingPosition, s"onSpark: $msg")
      }
    }
  }

  /** TYPED-side: the method symbol of a call whose callee carries
    * @graftSrc (any qualifier shape — the typed tree is symbol-precise),
    * plus the call's concrete type arguments (the typer inserts the
    * TypeApply whether they were written or inferred — the monomorphizer
    * reads the resolved types from it). */
  private def libDefCallTypedT(t: Tree): Option[(MethodSymbol, List[Type])] = {
    @annotation.tailrec
    def peel(f: Tree, seenArgs: Boolean,
        targs: List[Type]): Option[(MethodSymbol, List[Type])] = f match {
      case Apply(g, _) => peel(g, seenArgs = true, targs)
      case TypeApply(g, as) => peel(g, seenArgs, as.map(_.tpe))
      case _ =>
        if (seenArgs && f.symbol != null && f.symbol != NoSymbol && f.symbol.isMethod)
          Some((f.symbol.asMethod, targs))
        else None
    }
    peel(t, seenArgs = false, Nil).filter(p => libSrcOf(p._1).isDefined)
  }

  private def libDefCallTyped(t: Tree): Option[MethodSymbol] =
    libDefCallTypedT(t).map(_._1)

  /** Entry: inline same-object helper `def`s whose calls build DEPENDENT
    * generator bags (symbol-precise), or appear in GUARD/YIELD positions
    * (name-based — those positions are executor-side lambdas, so a
    * DataBag-returning call there was an abort regardless; after inlining
    * the correlated-fold/semi-join machinery gets a chain to derive).
    * Only shapes that would otherwise ABORT are rewritten (independent
    * bags evaluate eagerly and derivable chain shapes unnest already), so
    * this pass can only turn aborts into derivations. Returns the
    * rewritten comprehension wrapped for re-expansion, or None. */
  private def inlineHelperDefs(expr: Tree, gens: List[Gen],
      tbody: Tree): Option[Tree] = {
    // TYPED-side verified allowlist for guard/yield positions: names whose
    // call symbol is a same-object, unit-resolvable, DataBag-returning def
    def typedCallNames(t: Tree): Set[TermName] = {
      val b = Set.newBuilder[TermName]
      t.foreach { x =>
        sameObjectDefCall(x) match {
          case Some(m) if spliceableLib(m) && findUnitDefDef(m).isDefined =>
            b += m.name.toTermName
          case _ => ()
        }
      }
      b.result()
    }
    val gbAllow = typedCallNames(
      Block(gens.flatMap(_.guards.map(_.cond)), tbody))
    // binder names in scope anywhere in the comprehension (generator
    // binders, pattern binds, lambda params, quoted-block locals): the
    // poison set for betaReduceU's external-local recapture check (same
    // names on the typed tree as on its untypecheck)
    val spliceBound = boundNamesIn(expr)
    // cross-file @lib pick: resolve, parse, qualify; a stored-but-
    // unqualifiable def aborts with its guidance. Type-parameterized defs
    // monomorphize here from the TYPED call's resolved type arguments.
    def libPick(bag: Tree): Option[(Symbol, DefDef, Boolean)] =
      libDefCallTypedT(bag).filter(p => returnsDataBag(p._1)) match {
        case Some((m, targTypes)) => libDefOf(m) match {
          case Right((dd0, bare)) =>
            val clash = bare.intersect(spliceBound)
            if (clash.nonEmpty)
              c.abort(c.enclosingPosition,
                s"onSpark: @lib def '${m.name}' uses universe name(s) " +
                s"${clash.mkString(", ")} that collide with a binder at the " +
                "splice site — rename the binder")
            val dd =
              if (dd0.tparams.isEmpty) dd0
              else {
                val targTrees = targTypes.map(tp => typeArgTree(m, tp) match {
                  case Right(t) => t
                  case Left(msg) => c.abort(c.enclosingPosition, s"onSpark: $msg")
                })
                monomorphizeLibDef(m, dd0, targTrees) match {
                  case Right(d) => d
                  case Left(msg) => c.abort(c.enclosingPosition, s"onSpark: $msg")
                }
              }
            Some((m, dd, false))
          case Left(msg) => c.abort(c.enclosingPosition, s"onSpark: $msg")
        }
        case None => None
      }
    val symsPerLevel = gens.map(levelSyms)
    val picks: List[Option[(Symbol, DefDef, Boolean)]] =
      gens.zipWithIndex.map { case (g, i) =>
        if (i == 0 || !usesAny(g.bag, symsPerLevel.take(i).flatten)) None
        else if (isLocalBagCtor(g.bag)) None
        else sameObjectDefCall(g.bag) match {
          case Some(m) if returnsDataBag(m) =>
            findUnitDefDef(m).map(dd => (dd.symbol: Symbol, dd, true))
              .orElse(libPick(g.bag))
          case _ => libPick(g.bag)
        }
      }
    val uexpr = c.untypecheck(expr)
    flatten(uexpr) match {
      case Some((ugens, ubody)) if ugens.length == gens.length =>
        val reps = scala.collection.mutable.ListBuffer.empty[(Tree, Tree)]
        picks.zip(ugens).foreach {
          case (Some((sym, dd, bareReg)), ug) =>
            // untyped twin peel, module-qualified included (symbol already
            // adjudicated on the typed side)
            @annotation.tailrec
            def peelAny(f: Tree, argss: List[List[Tree]]): Option[List[List[Tree]]] =
              f match {
                case Apply(g2, as) => peelAny(g2, as :: argss)
                case TypeApply(g2, _) => peelAny(g2, argss)
                case Ident(_) | Select(_, _) if argss.nonEmpty => Some(argss)
                case _ => None
              }
            peelAny(ug.bag, Nil) match {
              case Some(argssU) =>
                reps += ((ug.bag,
                  betaReduceSym(sym, dd, argssU, Nil, spliceBound, bareReg)))
              case None => c.abort(c.enclosingPosition,
                "internal: helper call shape changed after untypecheck")
            }
          case _ => ()
        }
        // guard conditions and the yield: bare-name inlining restricted to
        // the typed-side verified allowlist (shadow-tracked); QUALIFIED
        // cross-file @lib calls resolve symbol-verified inside inlineCallsU
        val hasLibGY = (gens.flatMap(_.guards.map(_.cond)) :+ tbody).exists(t =>
          t.exists(x => libDefCallTyped(x).exists(spliceableLib)))
        if (gbAllow.nonEmpty || hasLibGY) {
          val headHits = new InlineHits
          (ugens.flatMap(_.guards.map(_.cond)) :+ ubody).foreach { t =>
            val before = headHits.n
            val nt = inlineCallsU(t, Nil, headHits, only = Some(gbAllow),
              spliceBound = spliceBound)
            if (headHits.n > before) reps += ((t, nt))
          }
        }
        if (reps.isEmpty) return None
        val tf = new Transformer {
          override def transform(t: Tree): Tree =
            reps.collectFirst { case (o, nw) if o eq t => nw }
              .getOrElse(super.transform(t))
        }
        Some(q"_root_.graft.api.comprehensions.onSpark(${tf.transform(uexpr)})")
      case _ => None
    }
  }

  // --------------------------------- multi-generator groupBy fusion

  /** TYPED fusibility of one groupBy generator inside a MULTI-generator
    * chain: across every tree its binder is in scope for, each reference
    * must be `<g>.key` or a fusible Seq-fold of `<g>.values` whose stage
    * lambdas / fold argument do not recapture the binder. Unlike
    * [[groupFoldsOf]] this does NOT constrain other bags/binders — the
    * re-expanded macro adjudicates those. Returns the folds per tree (in
    * the callers' canonical tree order), or None when not fusible. */
  private def multiGroupFoldsOf(treesSyms: List[(Tree, Symbol)])
      : Option[List[List[GroupFoldOcc]]] = {
    val perTree = treesSyms.map { case (rawBody, sym) =>
      val body = inlineGroupAliases(rawBody,
        { case i: Ident => i.symbol == sym; case _ => false })
      val isRootT: Tree => Boolean = {
        case Select(i @ Ident(_), TermName("values")) => i.symbol == sym
        case _ => false
      }
      def usesG(t: Tree): Boolean =
        t.exists { case i: Ident => i.symbol == sym; case _ => false }
      val folds = collectGroupFolds(body, isRootT)
      def restOk(t: Tree): Boolean = t match {
        case _ if folds.exists(_._1 eq t) => true
        case Select(i @ Ident(_), TermName("key")) if i.symbol == sym => true
        case i @ Ident(_) if i.symbol == sym => false
        case _ => t.children.forall(restOk)
      }
      val ok = restOk(body) && folds.forall { case (_, st, _, arg) =>
        st.forall(s => !usesG(s._2)) && arg.forall(a => !usesG(a))
      }
      if (ok) Some(folds) else None
    }
    if (perTree.forall(_.isDefined)) Some(perTree.map(_.get)) else None
  }

  /** The canonical scan order for one generator's binder: the yield, every
    * guard condition in chain order, then every LATER generator's bag
    * expression (an earlier bag cannot reference the binder). Must produce
    * the same structure on the typed and untyped chains. */
  private def multiGroupScanTrees(idx: Int, gens: List[Gen], body: Tree): List[Tree] =
    (body :: gens.flatMap(_.guards).map(_.cond)) ::: gens.drop(idx + 1).map(_.bag)

  /** [[multiGroupScanTrees]] paired with the symbol the binder resolves to
    * in EACH tree: a guard attached to generator `idx` itself rebinds the
    * name through the guard lambda's OWN param (scalac desugaring), while
    * the yield, other generators' guards, and later bags see the
    * generator lambda's param. */
  private def multiGroupScanTreesT(idx: Int, gens: List[Gen], body: Tree)
      : List[(Tree, Symbol)] = {
    val gsym = gens(idx).v.symbol
    val guardPairs = gens.zipWithIndex.flatMap { case (g, j) =>
      g.guards.map(gd => (gd.cond, if (j == idx) gd.v.symbol else gsym))
    }
    ((body, gsym) :: guardPairs) ::: gens.drop(idx + 1).map(g => (g.bag, gsym))
  }

  /** The untyped twin of [[multiGroupScanTreesT]]: each tree paired with
    * the NAME the binder goes by there (guards attached to generator
    * `idx` use their own lambda param's name). */
  private def multiGroupScanTreesU(idx: Int, gens: List[Gen], body: Tree)
      : List[(Tree, TermName)] = {
    val gn = gens(idx).v.name
    val guardPairs = gens.zipWithIndex.flatMap { case (g, j) =>
      g.guards.map(gd => (gd.cond, if (j == idx) gd.v.name else gn))
    }
    ((body, gn) :: guardPairs) ::: gens.drop(idx + 1).map(g => (g.bag, gn))
  }

  /** A `Group(k, v)` two-slot pattern with plain bind-or-wildcard
    * sub-patterns: returns each slot's bound name (None for `_`). The
    * typed check requires the pattern's type to be [[graft.api.Group]];
    * untyped callers destructure by shape only (they re-locate lambdas
    * the TYPED pass already adjudicated). */
  private object GroupPat {
    private def slot(t: Tree): Option[Option[TermName]] = t match {
      case Bind(n: TermName, Ident(termNames.WILDCARD)) => Some(Some(n))
      case Bind(n: TermName, Typed(Ident(termNames.WILDCARD), _)) => Some(Some(n))
      case Ident(termNames.WILDCARD) => Some(None)
      case Typed(Ident(termNames.WILDCARD), _) => Some(None)
      case _ => None
    }
    def unapply(t: Tree): Option[(Option[TermName], Option[TermName])] = {
      val args = t match {
        case Apply(_, List(a, b)) => Some((a, b))
        case UnApply(_, List(a, b)) => Some((a, b))
        case _ => None
      }
      val groupTyped = t.tpe == null ||
        t.tpe.baseClasses.exists(_.fullName == "graft.api.Group")
      if (!groupTyped) None
      else args.flatMap { case (a, b) =>
        for (ka <- slot(a); vb <- slot(b)) yield (ka, vb)
      }
    }
  }

  /** The single-param lambda whose param ValDef is `param` (by reference
    * identity — flatten returns the actual subtrees). */
  private def lambdaOf(root: Tree, param: ValDef): Option[Tree] =
    root.find {
      case Function(List(p), _) => p eq param
      case _ => false
    }

  /** scalac inserts `withFilter { case <pat> => true; case _ => false }`
    * (check$ifrefutable) before a pattern generator's match-lambda; on a
    * groupBy bag the Group pattern is irrefutable, so the check is the
    * identity — strip it for the plain-binder rewrite. */
  private def stripRefutCheck(bag: Tree): Tree = bag match {
    case Call1(inner, TermName("withFilter"), f) if isRefutCheck(f) => inner
    case _ => bag
  }
  private def isRefutCheck(f: Tree): Boolean = f match {
    case Block(Nil, inner) => isRefutCheck(inner)
    // the param-name gate keeps a USER filter that happens to be a 2-case
    // true/false match from being stripped (and keeps this walk agreeing
    // with isRefutCheckGuard's identically-gated guard drop)
    case Function(List(vd), Match(_, List(
        CaseDef(_, EmptyTree, Literal(Constant(true))),
        CaseDef(_, EmptyTree, Literal(Constant(false)))))) =>
      vd.name.toString.startsWith("check$ifrefutable")
    case _ => false
  }

  /** The check$ifrefutable filter as peeled by FilterChain: GenLam's
    * plain-function fallback captures the whole 2-case match as the
    * guard condition (pat = None). Identity on a Group bag. */
  private def isRefutCheckGuard(gd: Guard): Boolean =
    gd.pat.isEmpty &&
      gd.v.name.toString.startsWith("check$ifrefutable") && (gd.cond match {
      case Match(_, List(CaseDef(_, EmptyTree, Literal(Constant(true))),
          CaseDef(_, EmptyTree, Literal(Constant(false))))) => true
      case _ => false
    })

  /** Group-PATTERN generators over groupBy bags (the reference's
    * "with duplicate group names" spelling,
    * BaseCodegenIntegrationSpec.scala:350-363: `Group(decade, dmovies) <-
    * movies groupBy ...`): rewrite each such match-lambda (the
    * generator's and its guards') to a plain-binder lambda that reads
    * `g.key` / `g.values` — an irrefutable-pattern desugaring, identical
    * semantics — and re-expand, so the plain-binder fusion passes
    * (foldGroup fusion, HAVING guards, multi-group joins) all apply. A
    * name-shadowing disagreement between the typed and untyped reference
    * counts skips the rewrite entirely (the materializing path is
    * correct), never mis-substitutes. */
  private def rewriteGroupPatterns(expr: Tree, gens: List[Gen]): Option[Tree] = {
    // typed adjudication: generator index -> (kName, vName) slots, with
    // every guard of that generator also a two-slot Group pattern
    val targets = gens.zipWithIndex.flatMap { case (g, i) =>
      (g.pat, stripRefutCheck(g.bag)) match {
        case (Some(GroupPat(k, v)), Call1(xs, TermName("groupBy"), _))
            if isDataBag(xs) &&
              g.guards.forall(gd => isRefutCheckGuard(gd) || (gd.pat match {
                case Some(GroupPat(_, _)) => true
                case _ => false
              })) =>
          Some((i, (k, v)))
        case _ => None
      }
    }
    if (targets.isEmpty) return None
    def refCount(body: Tree, matches: Tree => Boolean): Int = {
      var n = 0
      body.foreach { case t if matches(t) => n += 1; case _ => () }
      n
    }
    def countsT(f: Tree): Option[(Int, Int)] = f match {
      case Function(List(_), Match(_, List(CaseDef(pat, EmptyTree, mbody)))) =>
        def symOf(slotName: Option[TermName]): Option[Symbol] = slotName.flatMap { n =>
          var s: Option[Symbol] = None
          pat.foreach {
            case b @ Bind(`n`, _) => s = Some(b.symbol)
            case _ => ()
          }
          s
        }
        pat match {
          case GroupPat(k, v) =>
            val kc = symOf(k).map(sym => refCount(mbody,
              { case i: Ident => i.symbol == sym; case _ => false })).getOrElse(0)
            val vc = symOf(v).map(sym => refCount(mbody,
              { case i: Ident => i.symbol == sym; case _ => false })).getOrElse(0)
            Some((kc, vc))
          case _ => None
        }
      case _ => None
    }
    def countsU(f: Tree): Option[(Int, Int)] = f match {
      case Function(List(_), Match(_, List(CaseDef(pat @ GroupPat(k, v), EmptyTree,
          mbody)))) =>
        def c(n: Option[TermName]) = n.map(nm => refCount(mbody,
          { case Ident(m: TermName) => m == nm; case _ => false })).getOrElse(0)
        Some((c(k), c(v)))
      case _ => None
    }
    val uexpr = c.untypecheck(expr)
    flatten(uexpr) match {
      case Some((ugens, _)) if ugens.length == gens.length &&
          ugens.map(_.guards.length) == gens.map(_.guards.length) =>
        val subs = scala.collection.mutable.ListBuffer.empty[(Tree, Tree)]
        // a Group match-lambda rewritten to a plain-binder lambda reading
        // .key/.values; None = shadowing or shape drift (keep unfused)
        def rewriteLambda(tf: Tree, uf: Tree): Option[(Tree, Tree)] = {
          (countsT(tf), countsU(uf)) match {
            case (Some(tc), Some(uc)) if tc == uc => ()
            case _ => return None
          }
          uf match {
            case Function(List(_), Match(_, List(CaseDef(GroupPat(k, v),
                EmptyTree, mbody)))) =>
              val gN = TermName(c.freshName("g$"))
              val rw = new Transformer {
                override def transform(t: Tree): Tree = t match {
                  case Ident(m: TermName) if k.contains(m) =>
                    q"${Ident(gN)}.key"
                  case Ident(m: TermName) if v.contains(m) =>
                    q"${Ident(gN)}.values"
                  case _ => super.transform(t)
                }
              }
              Some((uf, lam(gN, rw.transform(mbody))))
            case _ => None
          }
        }
        for ((i, _) <- targets) {
          val tg = gens(i)
          val ug = ugens(i)
          // the generator's own lambda; guards are either the identity
          // check$ifrefutable (neutralized to `_ => true`) or Group
          // pattern re-matches (rewritten like the generator)
          val genPair = for {
            tf <- lambdaOf(expr, tg.v)
            uf <- lambdaOf(uexpr, ug.v)
            rw <- rewriteLambda(tf, uf)
          } yield rw
          genPair match {
            case Some(p) => subs += p
            case None => return None
          }
          for ((tgd, ugd) <- tg.guards.zip(ug.guards)) {
            val uf = lambdaOf(uexpr, ugd.v) match {
              case Some(f) => f
              case None => return None
            }
            if (isRefutCheckGuard(tgd)) {
              val gN = TermName(c.freshName("g$"))
              subs += ((uf, lam(gN, Literal(Constant(true)))))
            } else {
              val pair = for {
                tf <- lambdaOf(expr, tgd.v)
                rw <- rewriteLambda(tf, uf)
              } yield rw
              pair match {
                case Some(p) => subs += p
                case None => return None
              }
            }
          }
        }
        Some(q"_root_.graft.api.comprehensions.onSpark(${substituteTrees(uexpr, subs.toList)})")
      case _ => None
    }
  }

  /** Multi-generator groupBy fusion (the reference's FoldGroup "with
    * multiple groups in the same comprehension",
    * BaseCodegenIntegrationSpec.scala:365-372, via FoldGroupFusion): in a
    * chain of >= 2 generators, any `g <- xs.groupBy(k)` whose binder is
    * referenced ONLY as `g.key` / fusible folds of `g.values` rewrites to
    * `xs.foldGroup(k, <Alg2-composed algebra>)` with each fold occurrence
    * replaced by its tuple accessor, and the macro re-expands on the
    * rewritten comprehension: group Seqs never materialize, and the
    * key-equality guards then derive the equi join between PRE-AGGREGATED
    * relations (K rows a side) instead of joining materialized groups.
    * Generators that fail validation stay on the materializing path. */
  private def fuseMultiGroupBys(expr: Tree, gens: List[Gen], tbody: Tree)
      : Option[Tree] = {
    val candidates = gens.zipWithIndex.collect {
      case (g, i) if g.pat.isEmpty && (g.bag match {
        case Call1(xs, TermName("groupBy"), _) => isDataBag(xs)
        case _ => false
      }) => i
    }
    if (candidates.isEmpty) return None
    // fuse the FIRST validating candidate; the emitted onSpark re-expands
    // and fuses the next one, so a chain of N groupBys converges in N
    // passes without cross-generator substitution conflicts
    val validated = candidates.iterator.map { i =>
      (i, multiGroupFoldsOf(multiGroupScanTreesT(i, gens, tbody)))
    }.collectFirst { case (i, Some(folds)) => (i, folds) }
    val (i, tFolds) = validated match {
      case Some(v) => v
      case None => return None
    }
    val uexpr = c.untypecheck(expr)
    flatten(uexpr) match {
      case Some((ugens, ubody)) if ugens.length == gens.length &&
          ugens.map(_.guards.length) == gens.map(_.guards.length) =>
        val ug = ugens(i)
        def isIdentN(n: TermName): Tree => Boolean = {
          case Ident(m: TermName) => m == n
          case _ => false
        }
        def isRootN(n: TermName): Tree => Boolean = {
          case Select(Ident(m: TermName), TermName("values")) => m == n
          case _ => false
        }
        // per scan tree: inline block aliases of <binder>.values/.key,
        // collect that tree's folds from the INLINED version
        val scanU = multiGroupScanTreesU(i, ugens, ubody).map { case (t, n) =>
          val inlined = inlineGroupAliases(t, isIdentN(n))
          (t, n, inlined, collectGroupFolds(inlined, isRootN(n)))
        }
        // typed matched by SYMBOL, this pass by NAME — exact agreement
        // or a shadowing binder could silently mis-fuse
        if (scanU.map(_._4.length) != tFolds.map(_.length))
          c.abort(c.enclosingPosition,
            "onSpark: an inner binder shadows the Group binder '" + ug.v.name +
            "' inside the comprehension — rename it so the fused rewrite can " +
            "tell which `.values` folds belong to the group")
        val (xsU, kLamU) = ug.bag match {
          case Call1(q, TermName("groupBy"), kl) => (q, kl)
          case _ => c.abort(c.enclosingPosition,
            "internal: groupBy shape changed after untypecheck")
        }
        val all = scanU.flatMap(_._4)
        // a key-only binder still fuses: Size is the placeholder algebra
        // (the values slot is simply never read)
        val algsConvs =
          if (all.isEmpty) List((q"_root_.graft.api.alg.Size": Tree, identity[Tree] _))
          else all.map(groupFoldAlg)
        val algTree = algsConvs.map(_._1)
          .reduceRight((a, b) => q"_root_.graft.api.alg.Alg2($a, $b)")
        // one substitution pair PER SCAN TREE (original -> inlined with
        // this tree's fold occurrences replaced by tuple accessors rooted
        // at the tree's OWN binder name), plus the fused bag
        var off = 0
        val subs = scala.collection.mutable.ListBuffer.empty[(Tree, Tree)]
        for ((orig, n, inlined, folds) <- scanU) {
          if (folds.nonEmpty || !(inlined eq orig)) {
            val pairs = folds.zipWithIndex.map { case (occ, j) =>
              (occ._1, groupFoldAccessor(q"${Ident(n)}.values", off + j,
                algsConvs.length, algsConvs(off + j)._2))
            }
            subs += ((orig, substituteTrees(inlined, pairs)))
          }
          off += folds.length
        }
        subs += ((ug.bag, q"$xsU.foldGroup($kLamU, $algTree)"))
        val substituted = substituteTrees(uexpr, subs.toList)
        // c.untypecheck keeps lambda-param type annotations: every lambda
        // binding the fused binder still says Group[K, Seq[A]] while the
        // rewritten bag yields Group[K, <fold tuple>] — clear those tpts
        // so the re-expansion re-infers them
        val fusedNames = (ug.v.name :: ug.guards.map(_.v.name)).toSet
        val clearTpts = new Transformer {
          override def transform(t: Tree): Tree = t match {
            case Function(params, body) =>
              val ps = params.map { vd =>
                if (fusedNames.contains(vd.name))
                  treeCopy.ValDef(vd, vd.mods, vd.name, TypeTree(), vd.rhs)
                else vd
              }
              treeCopy.Function(t, ps, transform(body))
            case _ => super.transform(t)
          }
        }
        Some(q"_root_.graft.api.comprehensions.onSpark(${clearTpts.transform(substituted)})")
      case _ => None
    }
  }

  // ------------------------------------ correlated scalar folds in the head

  /** A monoid fold terminating a filter/map chain: (chain, fold kind,
    * optional fold-lambda). Shape-only (typed and untyped); sees through
    * `sum`'s implicit Numeric list. `min`/`max` carry their implicit
    * Ordering as the argument — they have no empty-group zero, so their
    * derivation joins in a THROW for a missing group (the sequential
    * semantics of `min` on an empty bag). */
  private object FoldCall {
    def unapply(t: Tree): Option[(Tree, TermName, List[Tree])] = t match {
      case Select(q, n @ TermName("size")) => Some((q, n, Nil))
      case Apply(Select(q, n @ TermName("sum")), _) => Some((q, n, Nil))
      case Select(q, n @ TermName("sum")) => Some((q, n, Nil))
      case Apply(Select(q, n @ TermName("min")), List(ord)) => Some((q, n, List(ord)))
      case Apply(Select(q, n @ TermName("max")), List(ord)) => Some((q, n, List(ord)))
      case Apply(Select(q, n @ TermName("count")), List(lam)) => Some((q, n, List(lam)))
      case Apply(Apply(Select(q, n @ TermName("top")), List(k)), List(ord)) =>
        Some((q, n, List(k, ord)))
      case Apply(Apply(Select(q, n @ TermName("bottom")), List(k)), List(ord)) =>
        Some((q, n, List(k, ord)))
      // the nested-result fold: chain.collect() — zero args distinguishes
      // it from Seq.collect(partialFunction)
      case Apply(Select(q, n @ TermName("collect")), Nil) => Some((q, n, Nil))
      // HEAD-position exists (SQL's SELECT-list EXISTS): classifies like
      // count (exists(p) ≡ count(p) > 0); GUARD-position exists keeps
      // deriving semi joins (semiPlanOf runs first there)
      case Apply(Select(q, n @ TermName("exists")), List(lam)) => Some((q, n, List(lam)))
      case _ => None
    }
  }

  /** The chain under a [[FoldCall]]: `root.withFilter(f)*.map(m)?`
    * decomposed as (root, peeled guards, optional map lambda). Total —
    * derivability is decided by [[foldPlanOf]]'s classification. */
  private def foldChainOf(t: Tree): (Tree, List[Guard], Option[(ValDef, Option[Tree], Tree)]) =
    t match {
      case Call1(FilterChain(root, gs), TermName("map"), GenLam(v, p, b)) =>
        (root, gs, Some((v, p, b)))
      case FilterChain(root, gs) => (root, gs, None)
      case other => (other, Nil, None)
    }

  /** A correlated scalar fold derived as pre-aggregate + left outer join
    * (the reference's FoldGroupFusion shape). Role lists align with the
    * untyped twin positionally. */
  private case class FoldPlan(
      kind: TermName,              // size | count | sum | min | max | top | bottom
      guardRoles: List[ConjRole],  // one per withFilter guard (pre-split conjuncts)
      countRoles: List[ConjRole],  // count-lambda conjuncts (count ≡ withFilter(p).size)
      hasMap: Boolean,
      vTpe: Type)                  // the fold's TYPED value type (batch zero[V] emission)

  /** Separable-equality classification shared with the quantified-guard
    * derivation: l/r must split into an inner-only side and a side that
    * uses the comprehension variables. */
  private def separableKey(allGen: Seq[Symbol], inner: Seq[Symbol],
      l: Tree, r: Tree, cj: Tree): Option[ConjRole] = {
    val (lIn, rIn) = (usesAny(l, inner), usesAny(r, inner))
    if (distributedValueRef(cj).isDefined) None
    else if (lIn && !rIn && !usesAny(l, allGen) && usesAny(r, allGen))
      Some(KeyPair(swapped = true))
    else if (rIn && !lIn && !usesAny(r, allGen) && usesAny(l, allGen))
      Some(KeyPair(swapped = false))
    else None
  }

  private def innerOnly(allGen: Seq[Symbol], cj: Tree): Boolean =
    !usesAny(cj, allGen) && distributedValueRef(cj).isEmpty

  /** Derivability analysis of one TYPED head fold occurrence:
    * the root must be a distributed bag independent of the generators
    * (literal-ctor chains stay with the head-localization path), every
    * withFilter conjunct must be a separable key equality or inner-only,
    * at least one key must exist, and the map / count lambdas must be
    * inner-only (a generator-dependent value can't pre-aggregate). */
  /** Predicate-carrying fold kinds: count(p) and HEAD-position exists(p)
    * (exists ≡ count(p) > 0) — their lambda's conjuncts classify exactly
    * like withFilter guard conjuncts. */
  private def isPredFold(kind: TermName): Boolean =
    kind == TermName("count") || kind == TermName("exists")

  private def foldPlanOf(allGen: Seq[Symbol], t: Tree): Option[FoldPlan] = t match {
    case FoldCall(chain, kind, args) if !t.exists(isLocalBagCtor) =>
      val (root, gs, mapLam) = foldChainOf(chain)
      val arg = if (isPredFold(kind)) args.headOption else None
      // count's/exists's predicate sees the CHAIN-END element: with a
      // trailing map it would filter mapped values — not expressible as a
      // root pre-filter, so rejected; top/bottom's k and Ordering must not
      // depend on the generators (they parameterize ONE shared aggregate)
      if (!isDataBag(root) || usesAny(root, allGen) ||
          (isPredFold(kind) && mapLam.isDefined) ||
          (!isPredFold(kind) && !args.forall(a => innerOnly(allGen, a)))) None
      else {
        def conjRole(inner: Seq[Symbol])(cj: Tree): Option[ConjRole] = cj match {
          case Eq(l, r) => separableKey(allGen, inner, l, r, cj)
            .orElse(if (innerOnly(allGen, cj)) Some(InnerFilter) else None)
          case _ => if (innerOnly(allGen, cj)) Some(InnerFilter) else None
        }
        val guardRoles: List[Option[ConjRole]] =
          gs.map(g => conjRole(guardSyms(g))(g.cond))
        // count(p) ≡ withFilter(p).size: its conjuncts classify exactly
        // like guard conjuncts (the canonical correlated count puts the
        // key INSIDE the predicate)
        val countRoles: Option[List[Option[ConjRole]]] = arg match {
          case None => Some(Nil)
          case Some(GenLam(v, p, body)) =>
            val inner = p.map(bindSyms).getOrElse(List(v.symbol))
            Some(conjuncts(body).map(conjRole(inner)))
          case Some(_) => None
        }
        val mapOk = mapLam.forall { case (_, _, b) => innerOnly(allGen, b) }
        val allRoles = guardRoles ++ countRoles.getOrElse(Nil)
        if (countRoles.isDefined && allRoles.forall(_.isDefined) && mapOk &&
            allRoles.flatten.exists(_.isInstanceOf[KeyPair]))
          Some(FoldPlan(kind, guardRoles.map(_.get),
            countRoles.get.map(_.get), mapLam.isDefined,
            if (t.tpe == null) NoType else t.tpe.dealias))
        else None
      }
    case _ => None
  }

  /** Preorder head-fold occurrences: DERIVED subtrees are not descended
    * into; underivable matches ARE (a nested derivable fold may hide
    * inside, e.g. `chain.top(3).sum` where the outer sum is a plain List
    * op over the substituted value). */
  private def collectFoldCalls(body: Tree,
      plan: Tree => Option[FoldPlan]): List[(Tree, Option[FoldPlan])] = {
    val out = scala.collection.mutable.ListBuffer.empty[(Tree, Option[FoldPlan])]
    val trav = new Traverser {
      override def traverse(t: Tree): Unit = t match {
        case FoldCall(_, _, _) =>
          val p = plan(t)
          out += ((t, p))
          if (p.isEmpty) super.traverse(t)
        case _ => super.traverse(t)
      }
    }
    trav.traverse(body)
    out.toList
  }

  /** The untyped twin of [[collectFoldCalls]]: replays the typed pass's
    * descend/skip decisions positionally (the untyped tree is structurally
    * identical, so preorder replay pairs the occurrences exactly). */
  private def collectFoldCallsReplay(body: Tree, derived: List[Boolean]): List[Tree] = {
    val out = scala.collection.mutable.ListBuffer.empty[Tree]
    var i = 0
    val trav = new Traverser {
      override def traverse(t: Tree): Unit = t match {
        case FoldCall(_, _, _) =>
          out += t
          val d = i < derived.length && derived(i)
          i += 1
          if (!d) super.traverse(t)
        case _ => super.traverse(t)
      }
    }
    trav.traverse(body)
    out.toList
  }

  /** [[distributedValueRef]] skipping the derived fold subtrees. */
  private def distributedRefOutside(t: Tree, skip: List[Tree]): Option[Tree] = {
    def isValueRef(r: Tree): Boolean =
      isDataBag(r) && (r.symbol == null || !r.symbol.isModule)
    var found: Option[Tree] = None
    val trav = new Traverser {
      override def traverse(tr: Tree): Unit =
        if (found.isEmpty && !skip.exists(_ eq tr)) tr match {
          case i @ Ident(_) if isValueRef(i) => found = Some(i)
          case s @ Select(_, _) if isValueRef(s) => found = Some(s)
          case _ => super.traverse(tr)
        }
    }
    trav.traverse(t)
    found
  }

  /** Replace each derived fold subtree (by reference identity) with its
    * fresh fold-value name. */
  private def substituteAll(body: Tree, pairs: List[(Tree, TermName)]): Tree =
    substituteTrees(body, pairs.map { case (t, n) => (t, Ident(n): Tree) })

  /** Replace subtrees (matched by reference identity) with replacements. */
  private def substituteTrees(body: Tree, pairs: List[(Tree, Tree)]): Tree = {
    val tr = new Transformer {
      override def transform(tree: Tree): Tree =
        pairs.find(_._1 eq tree) match {
          case Some((_, r)) => r
          case None => super.transform(tree)
        }
    }
    tr.transform(body)
  }

  /** Evaluate `inner` (written against one chain-lambda's binder) against
    * the fresh element param — a plain `val` alias or a pattern re-match.
    * Each key/value side gets its OWN scope: flattening all binders into
    * one scope would let a reused name bound to DIFFERENT pattern
    * components capture wrongly. */
  private def underChainBinder(fp: TermName, b: (TermName, Option[Tree]),
      inner: Tree): Tree = b match {
    case (n, None) => q"{ val $n = ${Ident(fp)}; $inner }"
    case (_, Some(pt)) => Match(Ident(fp), List(CaseDef(pt, EmptyTree, inner)))
  }

  /** Lower one derived head fold (untyped twin `t`, typed-derived `plan`)
    * onto the accumulated chain `acc`: build the keyed value bag
    * (inner-filtered, mapped to (key, contribution)), wrap `acc` in
    * `FoldGroups.sumJoin`, and return the new chain — the fold value rides
    * as the appended pair element. `mkOuter` builds the accumulated-side
    * key lambda. */
  private def lowerFold(acc: Tree, t: Tree, plan: FoldPlan,
      mkOuter: Tree => Tree): Tree = t match {
    case FoldCall(chain, _, args) =>
      val arg = if (isPredFold(plan.kind)) args.headOption else None
      val (root, gs, mapLam) = foldChainOf(chain)
      if (gs.length != plan.guardRoles.length)
        c.abort(c.enclosingPosition,
          "internal: head fold shape changed after untypecheck")
      // unify withFilter guard conjuncts and count-predicate conjuncts
      // (count ≡ withFilter(p).size; count-with-map is rejected by
      // analysis, so the predicate sees the root element here)
      val countConjs: List[(TermName, Option[Tree], Tree)] = arg match {
        case Some(GenLam(v, p, body)) => conjuncts(body).map(cj => (v.name, p, cj))
        case Some(_) => c.abort(c.enclosingPosition,
          "internal: count lambda shape changed after untypecheck")
        case None => Nil
      }
      if (countConjs.length != plan.countRoles.length)
        c.abort(c.enclosingPosition,
          "internal: count lambda shape changed after untypecheck")
      val tagged: List[((TermName, Option[Tree], Tree), ConjRole)] =
        gs.map(g => (g.v.name, g.pat, g.cond)).zip(plan.guardRoles) ++
          countConjs.zip(plan.countRoles)
      val filtered = tagged.collect { case (cj, InnerFilter) => cj }
        .foldLeft(root) { case (b, (n, p, cj)) =>
          q"$b.withFilter(${binderLam(n, p, cj)})"
        }
      // separable equalities: (outer, inner) sides
      val pairs = tagged.collect { case ((n, p, cj), KeyPair(sw)) =>
        val (l, r) = Eq.unapply(cj).getOrElse(c.abort(c.enclosingPosition,
          "internal: fold key conjunct shape changed after untypecheck"))
        (if (sw) (r, l) else (l, r), (n, p))
      }
      val outerK = pairs.map(_._1._1) match {
        case List(o) => o
        case more => q"(..$more)"
      }
      // the (key, contribution) projection: each key side evaluates in
      // ITS OWN guard-binder scope (a reused name bound to different
      // pattern components must not cross-capture), the contribution in
      // the map lambda's (sum/top), the element itself (bare sum/top),
      // or 1L (size/count)
      val fp = TermName(c.freshName("e$"))
      val isTopK = plan.kind == TermName("top") || plan.kind == TermName("bottom")
      val isMinMax = plan.kind == TermName("min") || plan.kind == TermName("max")
      val isCollect = plan.kind == TermName("collect")
      val (valueTree, valueBinder) = (plan.kind, mapLam) match {
        case (TermName("sum"), Some((v, p, b))) => (b, Some((v.name, p)))
        case (TermName("sum"), None) => (Ident(fp): Tree, None)
        case (_, Some((v, p, b))) if isTopK || isMinMax || isCollect =>
          (b, Some((v.name, p)))
        case (_, None) if isTopK || isMinMax || isCollect =>
          (Ident(fp): Tree, None)
        case _ => (q"1L", None)
      }
      val keyVals = pairs.map { case ((_, in), b) =>
        (TermName(c.freshName("k$")), underChainBinder(fp, b, in))
      }
      val vName = TermName(c.freshName("v$"))
      val valExpr = valueBinder.fold(valueTree)(b => underChainBinder(fp, b, valueTree))
      val keyTuple = keyVals.map(kv => Ident(kv._1): Tree) match {
        case List(one) => one
        case more => q"(..$more)"
      }
      val stmts = keyVals.map { case (kn, e) => q"val $kn = $e" } :+ q"val $vName = $valExpr"
      val projected = lam(fp, q"{ ..$stmts; ($keyTuple, ${Ident(vName)}) }")
      val keyed = q"$filtered.map($projected)"
      if (isTopK) {
        val smallest = plan.kind == TermName("bottom")
        q"""_root_.graft.api.FoldGroups.topJoin($acc, $keyed, ${args(0)},
            ${args(1)}, $smallest)(${mkOuter(outerK)})"""
      } else if (isMinMax) {
        val smallest = plan.kind == TermName("min")
        q"""_root_.graft.api.FoldGroups.minMaxJoin($acc, $keyed, $smallest,
            ${args(0)})(${mkOuter(outerK)})"""
      } else if (isCollect)
        q"_root_.graft.api.FoldGroups.collectJoin($acc, $keyed)(${mkOuter(outerK)})"
      else if (plan.kind == TermName("exists"))
        // exists(p) ≡ count(p) > 0: the sumJoin's zero default makes a
        // missing group false, exactly the empty-bag exists
        q"""_root_.graft.api.FoldGroups.sumJoin($acc, $keyed)(${mkOuter(outerK)})
            .map(p => (p._1, p._2 > 0L))"""
      else
        q"_root_.graft.api.FoldGroups.sumJoin($acc, $keyed)(${mkOuter(outerK)})"
    case _ =>
      c.abort(c.enclosingPosition,
        "internal: head fold no longer matches after untypecheck")
  }

  // ------------------------------- fold-forest fusion (same-key batching)

  /** Kinds whose contributions combine componentwise in one
    * [[FoldGroups.reduceJoin]] batch (top/bottom ride their own heap
    * aggregator and stay unbatched). */
  private val batchableFoldKinds: Set[TermName] =
    Set("size", "sum", "count", "min", "max").map(TermName(_))

  /** The decomposed pieces of one derivable fold occurrence (untyped
    * twin), aligned with its plan: root chain, unified guard/count
    * conjuncts with roles, optional map lambda, kind, fold args. */
  private case class FoldPieces(root: Tree,
      tagged: List[((TermName, Option[Tree], Tree), ConjRole)],
      mapLam: Option[(TermName, Option[Tree], Tree)],
      kind: TermName, args: List[Tree], vTpe: Type)

  private def foldPieces(t: Tree, plan: FoldPlan): Option[FoldPieces] = t match {
    case FoldCall(chain, _, args) =>
      val arg = if (plan.kind == TermName("count")) args.headOption else None
      val (root, gs, mapLam) = foldChainOf(chain)
      if (gs.length != plan.guardRoles.length) None
      else {
        val countConjs: Option[List[(TermName, Option[Tree], Tree)]] = arg match {
          case Some(GenLam(v, p, body)) => Some(conjuncts(body).map(cj => (v.name, p, cj)))
          case Some(_) => None
          case None => Some(Nil)
        }
        countConjs.filter(_.length == plan.countRoles.length).map { ccs =>
          FoldPieces(root,
            gs.map(g => (g.v.name, g.pat, g.cond)).zip(plan.guardRoles) ++
              ccs.zip(plan.countRoles),
            mapLam.map { case (v, p, b) => (v.name, p, b) }, plan.kind, args,
            plan.vTpe)
        }
      }
    case _ => None
  }

  /** Two folds batch when their root chain, every conjunct (binder names
    * included — structural equality), and every role coincide: the
    * filtered keyed relation is then IDENTICAL and only the contribution
    * differs. */
  private def sameFoldShape(a: FoldPieces, b: FoldPieces): Boolean =
    a.root.equalsStructure(b.root) && a.tagged.length == b.tagged.length &&
      a.tagged.zip(b.tagged).forall {
        case (((n1, p1, c1), r1), ((n2, p2, c2), r2)) =>
          n1 == n2 && r1 == r2 && c1.equalsStructure(c2) &&
            p1.size == p2.size &&
            p1.zip(p2).forall { case (x, y) => x.equalsStructure(y) }
      }

  /** Untyped two-param lambda. */
  private def lam2(a: TermName, b: TermName, body: Tree): Tree =
    Function(List(ValDef(Modifiers(Flag.PARAM), a, TypeTree(), EmptyTree),
      ValDef(Modifiers(Flag.PARAM), b, TypeTree(), EmptyTree)), body)

  /** Lower a batch (≥2) of same-shaped folds as ONE keyed relation whose
    * value is the tuple of per-fold contributions, one combinable
    * [[FoldGroups.reduceJoin]], and a re-nesting map that restores the
    * one-pair-per-fold stage-tuple shape downstream accessors expect. */
  private def lowerFoldBatch(acc: Tree, group: List[FoldPieces],
      mkOuter: Tree => Tree): Tree = {
    val h = group.head
    val filtered = h.tagged.collect { case (cj, InnerFilter) => cj }
      .foldLeft(h.root) { case (b, (n, p, cj)) =>
        q"$b.withFilter(${binderLam(n, p, cj)})"
      }
    val pairs = h.tagged.collect { case ((n, p, cj), KeyPair(sw)) =>
      val (l, r) = Eq.unapply(cj).getOrElse(c.abort(c.enclosingPosition,
        "internal: fold key conjunct shape changed after untypecheck"))
      (if (sw) (r, l) else (l, r), (n, p))
    }
    val outerK = pairs.map(_._1._1) match {
      case List(o) => o
      case more => q"(..$more)"
    }
    val fp = TermName(c.freshName("e$"))
    val keyVals = pairs.map { case ((_, in), b) =>
      (TermName(c.freshName("k$")), underChainBinder(fp, b, in))
    }
    val keyTuple = keyVals.map(kv => Ident(kv._1): Tree) match {
      case List(one) => one
      case more => q"(..$more)"
    }
    val valVals = group.map { pc =>
      val isSumLike = pc.kind == TermName("sum") ||
        pc.kind == TermName("min") || pc.kind == TermName("max")
      val (valueTree, valueBinder) = (isSumLike, pc.mapLam) match {
        case (true, Some((n, p, b))) => (b, Some((n, p)))
        case (true, None) => (Ident(fp): Tree, None)
        case _ => (q"1L": Tree, None) // size / count contribute 1L
      }
      (TermName(c.freshName("v$")),
        valueBinder.fold(valueTree)(b => underChainBinder(fp, b, valueTree)))
    }
    val stmts = (keyVals ++ valVals).map { case (n, e) => q"val $n = $e" }
    val vTuple = q"(..${valVals.map(v => Ident(v._1))})"
    val projected = lam(fp, q"{ ..$stmts; ($keyTuple, $vTuple) }")
    val keyed = q"$filtered.map($projected)"
    val aN = TermName(c.freshName("a$"))
    val bN = TermName(c.freshName("b$"))
    val slots = group.zipWithIndex.map { case (pc, j) =>
      val tj = TermName("_" + (j + 1))
      pc.kind match {
        case TermName("min") =>
          q"_root_.graft.api.FoldGroups.lesser(${Ident(aN)}.$tj, ${Ident(bN)}.$tj, ${pc.args(0)})"
        case TermName("max") =>
          q"_root_.graft.api.FoldGroups.greater(${Ident(aN)}.$tj, ${Ident(bN)}.$tj, ${pc.args(0)})"
        case _ =>
          q"_root_.graft.api.FoldGroups.plus(${Ident(aN)}.$tj, ${Ident(bN)}.$tj)"
      }
    }
    val comb = lam2(aN, bN, q"(..$slots)")
    // a min/max slot makes the WHOLE empty-group tuple throw (building it
    // would throw at that slot anyway — and a Nothing-typed slot beside
    // the polymorphic zero derails scalac's tuple inference)
    val missBody: Tree = group.find(pc =>
        pc.kind == TermName("min") || pc.kind == TermName("max")) match {
      case Some(mm) =>
        q"_root_.graft.api.FoldGroups.emptyGroup(${mm.kind.toString})"
      case None =>
        val zeros = group.map { pc =>
          // zero's Numeric resolves only with the type arg EXPLICIT (an
          // expected-return-type-only inference leaves V undetermined)
          if (pc.kind == TermName("sum")) {
            if (pc.vTpe == NoType)
              c.abort(c.enclosingPosition, "internal: untyped sum fold in batch")
            q"_root_.graft.api.FoldGroups.zero[${pc.vTpe}]": Tree
          } else q"0L": Tree // size / count
        }
        q"(..$zeros)"
    }
    val miss = Function(Nil, missBody)
    val call =
      q"_root_.graft.api.FoldGroups.reduceJoin($acc, $keyed)($comb)($miss)(${mkOuter(outerK)})"
    val pn = TermName(c.freshName("p$"))
    val nest = (1 to group.length).foldLeft(q"${Ident(pn)}._1": Tree) {
      (t, j) => q"($t, ${Ident(pn)}._2.${TermName("_" + j)})"
    }
    q"$call.map(${lam(pn, nest)})"
  }

  /** Lower a sequence of derived folds onto `acc`, batching CONSECUTIVE
    * same-shaped batchable folds into one [[FoldGroups.reduceJoin]]
    * (fold-forest fusion); `mkOuterAt(j)` builds the accumulated-side key
    * lambda for the fold at position j (j folds already appended). */
  private def lowerFoldChain(acc0: Tree, derived: List[(Tree, FoldPlan)],
      mkOuterAt: Int => Tree => Tree): Tree = {
    val pieces = derived.map { case (t, p) =>
      (t, p, if (batchableFoldKinds(p.kind)) foldPieces(t, p) else None)
    }
    var acc = acc0
    var j = 0
    while (j < pieces.length) {
      val (t, plan, pc) = pieces(j)
      val run = pc match {
        case Some(hd) =>
          var k = j + 1
          while (k < pieces.length && pieces(k)._3.exists(sameFoldShape(hd, _))) k += 1
          k - j
        case None => 1
      }
      if (sys.props.contains("graft.macro.debug"))
        c.info(c.enclosingPosition, s"fold batch at $j run=$run kind=${plan.kind}", force = true)
      acc =
        if (run >= 2) lowerFoldBatch(acc, pieces.slice(j, j + run).map(_._3.get), mkOuterAt(j))
        else lowerFold(acc, t, plan, mkOuterAt(j))
      j += run
    }
    acc
  }

  /** HEAD/GUARD NESTING (the reference's Normalize.scala:44-52 fixpoint
    * for closure positions, any depth): a yield or guard containing
    * nested comprehensions over literal `DataBag(seq)` ctors — provably
    * local, per-element collections — re-rooted onto the closure-safe
    * [[graft.api.LocalBag]], whose ops and folds share the distributed
    * bag's Alg algebras, so the value is identical and the nest runs
    * narrowly inside the map/filter closure instead of crashing on a
    * per-row SparkSession. The transformer recurses, so a depth-2 inner
    * yield's own ctor comprehension localizes in the same pass. Name-based
    * on the untyped tree (symbols are gone after untypecheck); only
    * applied when the TYPED body proved a literal ctor is present. */
  /** DataBag methods whose trailing implicit list is an Encoder — LocalBag's
    * twins take no such list, so the residual list the untypecheck keeps
    * must be dropped when the receiver chain is being localized. (Numeric/
    * Ordering implicit lists on sum/min/top/... are IDENTICAL on LocalBag
    * and stay.) */
  private val encoderMethods: Set[TermName] =
    Set(TermName("map"), TermName("flatMap"), TermName("groupBy"),
      TermName("foldGroup"))

  /** The SOURCE names the literal ctors were written with in the TYPED
    * body (symbols prove DataBag-ness; the Ident keeps the name as
    * written) — a renamed import (`import graft.api.{DataBag => DB}`)
    * must still be found by the name-based untyped-tree rewriter, or the
    * head compiles unrewritten and crashes on executors. "DataBag" is
    * always included (fully-qualified spellings select by symbol name). */
  private def ctorNamesIn(t: Tree): Set[TermName] = {
    val b = Set.newBuilder[TermName]
    t.foreach {
      case ct @ Call1(q, TermName("apply"), _) if isLocalBagCtor(ct) =>
        q match {
          case Ident(n: TermName) => b += n
          case Select(_, n: TermName) => b += n
          case _ => ()
        }
      case _ => ()
    }
    b.result() + TermName("DataBag")
  }

  /** True when `t` is a method-call chain whose RECEIVER root is a literal
    * `DataBag(seq)` ctor (arguments are not searched). */
  private def rootsInCtor(t: Tree, names: Set[TermName]): Boolean = t match {
    case Call1(q, TermName("apply"), _) if isDataBagName(q, names) => true
    case Apply(fun, _) => rootsInCtor(fun, names)
    case TypeApply(fun, _) => rootsInCtor(fun, names)
    case Select(qual, _) => rootsInCtor(qual, names)
    case _ => false
  }

  private def calledName(fun: Tree): Option[TermName] = fun match {
    case Select(_, n: TermName) => Some(n)
    case TypeApply(Select(_, n: TermName), _) => Some(n)
    case _ => None
  }

  private def localizeHead(t: Tree, names: Set[TermName]): Tree = {
    val tr = new Transformer {
      override def transform(tree: Tree): Tree = tree match {
        case Apply(inner @ Apply(fun, _), _)
            if calledName(fun).exists(encoderMethods) && rootsInCtor(inner, names) =>
          transform(inner) // drop the residual Encoder argument list
        case Call1(q, TermName("apply"), a) if isDataBagName(q, names) =>
          q"_root_.graft.api.LocalBag.of(${transform(a)})"
        case _ => super.transform(tree)
      }
    }
    val localized = tr.transform(t)
    // defensive backstop for the compile-time guarantee: the typed tree
    // PROVED a literal ctor is in the head — if a shape the name-based
    // rewriter cannot see survived, the emitted closure would build a
    // Dataset on executors; abort here instead of crashing at runtime
    if (localized.exists {
      case a @ Apply(_, _) => rootsInCtor(a, names)
      case _ => false
    }) c.abort(c.enclosingPosition,
      "onSpark: the yield contains a DataBag(seq) constructor spelling the head " +
      "rewriter does not recognize; bind the DataBag companion by its plain name " +
      "(`DataBag(...)`) inside the yield, or fold outside the comprehension")
    // the transplanted untypechecked subtrees can carry residual
    // attribution (symbol'd Selects, This-prefixed implicit refs) that
    // poisons re-typechecking of the REWRITTEN chain; a print/parse
    // round-trip yields a genuinely fresh tree — safe here because the
    // localized head is a plain expression (showCode of these shapes is
    // valid source)
    c.parse(showCode(localized))
  }
  private def isDataBagName(q: Tree, names: Set[TermName]): Boolean = q match {
    case Ident(n: TermName) => names(n)
    case Select(_, n: TermName) => names(n)
    case _ => false
  }

  /** Reference detection by SYMBOL identity on the typed tree — a guard
    * that contains a lambda shadowing a generator NAME must not count as
    * referencing that generator (name matching would demote its join key
    * to a post filter: still correct, worse plan). */
  private def uses(t: Tree, s: Symbol): Boolean =
    s != null && s != NoSymbol &&
      t.exists { case i: Ident => i.symbol == s; case _ => false }
  private def usesAny(t: Tree, ss: Seq[Symbol]): Boolean = ss.exists(uses(t, _))

  /** Bound names of a (typed or untyped) pattern, with symbols when typed. */
  private def bindNames(pat: Tree): List[TermName] = {
    val out = List.newBuilder[TermName]
    pat.foreach { case Bind(n: TermName, _) => out += n; case _ => () }
    out.result()
  }
  private def bindSyms(pat: Tree): List[Symbol] = {
    val out = List.newBuilder[Symbol]
    pat.foreach { case b @ Bind(_: TermName, _) => out += b.symbol; case _ => () }
    out.result()
  }

  /** The symbols a generator level binds (pattern binds, or the param). */
  private def levelSyms(g: Gen): List[Symbol] =
    g.pat.map(bindSyms).getOrElse(List(g.v.symbol))
  /** The symbols a GUARD's own lambda binds. */
  private def guardSyms(g: Guard): List[Symbol] =
    g.pat.map(bindSyms).getOrElse(List(g.v.symbol))

  /** Untyped single-param lambda (param type left for inference). */
  private def lam(p: TermName, body: Tree): Tree =
    Function(List(ValDef(Modifiers(Flag.PARAM), p, TypeTree(), EmptyTree)), body)

  /** A lambda binding via a guard/generator binder: plain name, or a
    * fresh param re-matched against the pattern. */
  private def binderLam(name: TermName, pat: Option[Tree], body: Tree): Tree =
    pat match {
      case None => lam(name, body)
      case Some(pt) =>
        val p = TermName(c.freshName("m$"))
        lam(p, Match(Ident(p), List(CaseDef(pt, EmptyTree, body))))
    }

  // ------------------------------------------------------- analysis (typed)

  /** How guard g of generator i combines, given outer variable symbols. */
  private sealed trait GuardRole
  private case object OwnFilter extends GuardRole  // references only level i
  private case class JoinKey(swapped: Boolean) extends GuardRole
  private case object PostFilter extends GuardRole

  private def roleOf(outer: Seq[Symbol], own: Seq[Symbol], g: Tree): GuardRole =
    g match {
      case _ if !usesAny(g, outer) => OwnFilter
      case Eq(l, r) if !usesAny(l, own) && !usesAny(r, outer) => JoinKey(swapped = false)
      case Eq(l, r) if !usesAny(r, own) && !usesAny(l, outer) => JoinKey(swapped = true)
      case _ => PostFilter
    }

  /** Per level ≥ 2: the roles of its guards. EVERY key-shaped guard keeps
    * its JoinKey role — the rebuild tuples them into ONE composite-key
    * equi join (the reference's MatchEquiJoin collects all equality
    * guards the same way). Joining on a partial key and post-filtering
    * the rest would be correct but explodes the intermediate when the
    * partial key is low-cardinality or skewed (273x at 200k rows —
    * PROFILE.md ProfileCompositeKey). Two consequences of riding the key,
    * both shared with the FIRST equality guard since the original
    * derivation and licensed by the comprehension-calculus purity
    * contract (see FilterChain's conjunct-splitting note): key
    * expressions are TOTAL — a later equality's sides evaluate on rows an
    * earlier guard would have short-circuited away — and floating-point
    * keys follow Spark join-key equality (NaN = NaN matches, unlike a
    * Scala == post-filter). Generator variables are identified by the
    * symbols of the flatMap/map lambda params (or their pattern binds);
    * each guard's OWN variables by its own lambda's param/pattern
    * symbols. */
  private def analyze(gens: List[Gen],
      claimed: List[List[Boolean]]): List[List[GuardRole]] = {
    val syms = gens.map(levelSyms)
    gens.zipWithIndex.drop(1).map { case (gen, i) =>
      val outer = syms.take(i).flatten
      gen.guards.zip(claimed(i)).map {
        // a guard already claimed by the semi/anti or fold derivation must
        // NOT consume a join-key slot: an Eq-shaped fold comparison
        // (count(...) == z) would otherwise ride the composite key
        case (_, true) => PostFilter
        case (g, false) => roleOf(outer, guardSyms(g), g.cond)
      }
    }
  }

  // ----------------------------- nested-comprehension generator unnesting

  /** FREE term names of a TYPED tree: every `Ident` whose symbol is not
    * defined inside the tree itself. */
  private def freeTermNames(t: Tree): Set[TermName] = {
    val defs = defSymsIn(t)
    val b = Set.newBuilder[TermName]
    t.foreach {
      case i @ Ident(n: TermName) if i.symbol == null || !defs(i.symbol) => b += n
      case _ => ()
    }
    b.result()
  }

  /** Every term name BOUND anywhere inside `t` (lambda params, local vals,
    * pattern binds) — works on typed and untyped trees. */
  private def boundNamesIn(t: Tree): Set[TermName] = {
    val b = Set.newBuilder[TermName]
    t.foreach {
      case d: DefTree => d.name match { case n: TermName => b += n; case _ => () }
      case _ => ()
    }
    b.result()
  }

  /** Substitute `rep` for every FREE `Ident(n)` in `t` (name-keyed, for
    * the untyped rebuild), not descending where `n` is rebound; returns
    * the rewritten tree and the replacement count. Callers verify the
    * count against the typed symbol-reference count — a disagreement
    * (name shadowing the typed/untyped walks see differently) skips the
    * rewrite entirely rather than mis-substituting. Shadowing scopes the
    * skip models EXACTLY: a Function param (whole body shadowed) and a
    * CaseDef pattern bind (guard+body shadowed). Scopes it cannot split
    * precisely — a Block whose stats rebind `n` as a val/def (occurrences
    * BEFORE the binding are free, after are not) or a local def with a
    * shadowing param — POISON the count (-1) so the caller declines;
    * skipping or descending either one could pair an over- and an
    * under-count into a passing total that substitutes the wrong sites. */
  private def substFreeName(t: Tree, n: TermName, rep: Tree): (Tree, Int) = {
    var cnt = 0
    var poisoned = false
    val tr = new Transformer {
      override def transform(x: Tree): Tree = x match {
        case Ident(`n`) => cnt += 1; rep.duplicate
        case f @ Function(ps, _) if ps.exists(_.name == n) => f
        case d: DefDef if d.name == n ||
            d.vparamss.exists(_.exists(_.name == n)) =>
          poisoned = true; d
        case b @ Block(stats, _) if stats.exists {
            case vd: ValDef => vd.name == n
            case dd: DefDef => dd.name == n
            case _ => false } =>
          poisoned = true; b
        case m @ Match(sel, cases) =>
          treeCopy.Match(m, transform(sel), cases.map { cd =>
            if (bindNames(cd.pat).contains(n)) cd
            else treeCopy.CaseDef(cd, cd.pat, transform(cd.guard), transform(cd.body))
          })
        case _ => super.transform(x)
      }
    }
    val res = tr.transform(t)
    (res, if (poisoned) -1 else cnt)
  }

  /** References to symbol `s` in `t` (typed tree, Ident occurrences). */
  private def symRefCount(t: Tree, s: Symbol): Int = {
    if (s == null || s == NoSymbol) return 0
    var n = 0
    t.foreach { case i: Ident if i.symbol == s => n += 1; case _ => () }
    n
  }

  /** Descend `k` flatMap levels into a comprehension chain (typed or
    * untyped) and return the node there — the subtree (by reference) whose
    * Call1 is generator k's own map/flatMap call. Mirrors [[flatten]]. */
  private def nodeAt(t: Tree, k: Int): Option[Tree] =
    if (k == 0) Some(t)
    else t match {
      case Call1(_, TermName("flatMap"), GenLam(_, _, rest)) => nodeAt(rest, k - 1)
      case _ => None
    }

  /** TYPED positional-constructor PATTERN of plain binds over a CASE
    * class — `(a, b) <- ...` (tuples are case classes) or
    * `P(a, b) <- ...`. Returns (bind names in component order, the class
    * symbol). Strictly the Apply-form scalac gives case-CLASS patterns;
    * an UnApply (custom extractor) must NOT match: its components need
    * not align positionally with the constructor call, and a partial
    * extractor's refutation check is not the identity. Arity must equal
    * the single primary-constructor parameter list. */
  private def casePat(p: Tree): Option[(List[TermName], Symbol)] = p match {
    case Apply(_, as) if p.tpe != null && p.tpe.typeSymbol != null &&
        p.tpe.typeSymbol != NoSymbol && p.tpe.typeSymbol.isClass &&
        p.tpe.typeSymbol.asClass.isCaseClass =>
      val cls = p.tpe.typeSymbol
      val ctor = cls.asClass.primaryConstructor
      val okArity = ctor != NoSymbol && (ctor.asMethod.paramLists match {
        case List(ps) => ps.length == as.length
        case _ => false
      })
      val names = as.map {
        case Bind(nm: TermName, Ident(termNames.WILDCARD)) => Some(nm)
        case _ => None
      }
      if (okArity && names.nonEmpty && names.forall(_.isDefined))
        Some((names.flatten, cls))
      else None
    case _ => None
  }

  /** TYPED positional construction of `cls` — the SYNTHETIC companion
    * `apply` (case classes and tuples) or the primary constructor — whose
    * components therefore align positionally with [[casePat]]'s binds.
    * A non-synthetic (user-defined) apply must not match. */
  private def caseYield(t: Tree, cls: Symbol): Option[List[Tree]] = t match {
    case Apply(f, comps) if t.tpe != null && t.tpe.typeSymbol == cls &&
        f.symbol != null && f.symbol != NoSymbol &&
        ((f.symbol.isSynthetic && f.symbol.name == TermName("apply")) ||
          f.symbol == cls.asClass.primaryConstructor) =>
      Some(comps)
    case _ => None
  }

  /** Does an UNTYPED constructor/pattern fun tree mention the class's
    * simple name? (untypecheck renders `(x, y)` as `scala.TupleN.apply(x,
    * y)` and a typed pattern's TypeTree as its original.) Used only for
    * typed-vs-untyped agreement — the strict adjudication is [[casePat]]/
    * [[caseYield]] on the typed tree. */
  private def mentionsCtorName(f: Tree, simple: String): Boolean = f match {
    case Ident(n) => n.toString == simple
    case Select(q, n) => n.toString == simple ||
      ((n == TermName("apply") || n == termNames.CONSTRUCTOR) &&
        mentionsCtorName(q, simple))
    case New(tpt) => mentionsCtorName(tpt, simple)
    case TypeApply(inner, _) => mentionsCtorName(inner, simple)
    case Apply(inner, _) => mentionsCtorName(inner, simple)
    case AppliedTypeTree(inner, _) => mentionsCtorName(inner, simple)
    case Annotated(_, inner) => mentionsCtorName(inner, simple)
    case tt: TypeTree if tt.original != null => mentionsCtorName(tt.original, simple)
    case _ => f.symbol != null && f.symbol != NoSymbol &&
      (f.symbol.name.toString == simple || f.symbol.owner.name.toString == simple)
  }

  /** UNTYPED twin of [[casePat]]: plain binds under a ctor pattern whose
    * fun mentions `simple`. */
  private def untypedPatNames(p: Tree, simple: String): Option[List[TermName]] =
    p match {
      case Apply(f, as) if mentionsCtorName(f, simple) =>
        val names = as.map {
          case Bind(nm: TermName, Ident(termNames.WILDCARD)) => Some(nm)
          case _ => None
        }
        if (names.nonEmpty && names.forall(_.isDefined)) Some(names.flatten)
        else None
      case _ => None
    }

  /** UNTYPED twin of [[caseYield]]: an n-ary ctor call mentioning
    * `simple`. */
  private def untypedCtorComps(t: Tree, simple: String, n: Int): Option[List[Tree]] =
    t match {
      case Apply(f, comps) if comps.length == n && mentionsCtorName(f, simple) =>
        Some(comps)
      case _ => None
    }

  /** The reference's UnnestGenerator rule (emma-language
    * lang/comprehension/Normalize.scala:44-52) for the DEPENDENT case the
    * linear engine otherwise aborts on: a generator whose bag is ITSELF a
    * comprehension chain over distributed bags and references earlier
    * generator variables (inside its guards and/or its yield), e.g.
    * `for { c <- cs; r <- (for { o <- os; if o.ck == c.ck } yield f(o, c)) } yield g(c, r)`.
    * By monad associativity the inner generators splice into the outer
    * chain, the inner YIELD value substitutes for the binder in every
    * downstream tree, and guards ON the binder become filters at the
    * spliced terminal level:
    * `cs.flatMap(c => os.withFilter(o => o.ck == c.ck).map(o => g(c, f(o, c))))`.
    * The macro then RE-EXPANDS on the flattened chain, where the former
    * inner guards are ordinary cross-variable guards — the correlation
    * derives an equi join exactly as if the user had flattened by hand.
    * Comprehension purity (the calculus contract) licenses duplicating
    * the inner yield expression into each use site.
    *
    * Conservative by construction — returns None (the existing
    * abort-with-guidance applies) unless: the binder, its guards' binders
    * and the typed/untyped walks all agree; every name substitution
    * replaces exactly as many occurrences as the typed tree has symbol
    * references; and no free name of a moved tree can be captured by a
    * binder it moves under (outer trees move INTO the inner lambdas; the
    * inner yield moves INTO downstream lambdas). */
  private def unnestGenerators(expr: Tree, gens: List[Gen]): Option[Tree] = {
    val syms = gens.map(levelSyms)
    // typed inner-chain walk: binder names bound by the chain + the yield
    def walk(t: Tree, acc: List[TermName]): Option[(List[TermName], Tree)] = t match {
      case Call1(base, TermName("map"), GenLam(zv, zpat, e)) if isDataBag(base) =>
        Some((acc ++ (zv.name :: zpat.map(bindNames).getOrElse(Nil)), e))
      case Call1(base, TermName("flatMap"), GenLam(zv, zpat, b)) if isDataBag(base) =>
        walk(b, acc ++ (zv.name :: zpat.map(bindNames).getOrElse(Nil)))
      case _ => None
    }
    // the generator binder's substitution plan: a plain binder substitutes
    // the whole inner yield; a tuple pattern of plain binds substitutes
    // component-wise when the inner yield is a literal TupleN of the same
    // arity (each bind name -> its component expression)
    def binderNames(pat: Option[Tree]): Option[List[TermName]] = pat match {
      case None => Some(Nil) // sentinel: plain (names resolved per side)
      case Some(pt) => casePat(pt).map(_._1)
    }
    val dbg = sys.props.contains("graft.unnest.debug")
    def trace(msg: => String): Unit =
      if (dbg) c.info(c.enclosingPosition, s"unnest: $msg", force = true)
    val cand = gens.zipWithIndex.drop(1).iterator.map { case (g, i) =>
      if (binderNames(g.pat).isDefined &&
          usesAny(stripRefutCheck(g.bag), syms.take(i).flatten) &&
          !isLocalBagCtor(g.bag))
        walk(stripRefutCheck(g.bag), Nil).map(w => (g, i, w))
      else None
    }.collectFirst { case Some(x) => x }
    if (dbg && cand.isEmpty)
      trace("no candidate: " + gens.zipWithIndex.drop(1).map { case (g, i) =>
        s"[$i pat=${g.pat.map(showRaw(_))} bn=${binderNames(g.pat)} " +
          s"dep=${usesAny(stripRefutCheck(g.bag), syms.take(i).flatten)} " +
          s"walk=${walk(stripRefutCheck(g.bag), Nil).isDefined}]"
      }.mkString(" "))
    cand.flatMap { case (tg, i, (innerNames, typedE)) =>
      // the typed downstream (generator i's lambda body) for count checks
      val typedNode = nodeAt(expr, i)
      val parts = typedNode.flatMap {
        case Call1(_, m, GenLam(yv, ypat, restT))
            if (m == TermName("map") || m == TermName("flatMap")) &&
              ypat == tg.pat =>
          Some((m, yv, ypat, restT))
        case _ => None
      }
      if (dbg && parts.isEmpty)
        trace(s"no parts at i=$i: node=${typedNode.map(showRaw(_)).getOrElse("<none>").take(400)}")
      if (dbg && parts.nonEmpty)
        trace(s"parts ok; ypat=${parts.get._3.map(showRaw(_))}; typedE=${showRaw(typedE)}")
      parts.flatMap { case (mT, yvT, ypatT, restT) =>
        val inner = innerNames.toSet
        // typed substitution spec: (name, typed symbol, component index),
        // plus the pattern's class symbol when destructuring; index -1 =
        // the whole inner yield (plain binder)
        val specT: Option[(List[(TermName, Symbol, Int)], Option[Symbol])] =
          ypatT match {
            case None => Some((List((yvT.name, yvT.symbol, -1)), None))
            case Some(pt) => casePat(pt) match {
              case Some((names, cls)) => caseYield(typedE, cls) match {
                case Some(comps) if names.length == comps.length =>
                  val ss = bindSyms(pt)
                  if (ss.length == names.length)
                    Some((names.zip(ss).zipWithIndex.map {
                      case ((n, s), k) => (n, s, k) }, Some(cls)))
                  else None
                case _ => None
              }
              case None => None
            }
          }
        // guards at the binder's level must carry the same binder shape
        // (same class, same bind names); their substitution symbols are
        // their OWN lambda/pattern binds
        def guardSpec(g: Guard, names: List[TermName],
            patCls: Option[Symbol]): Option[List[Symbol]] =
          (g.pat, names) match {
            case (None, List(n)) if g.v.name == n && patCls.isEmpty =>
              Some(List(g.v.symbol))
            case (Some(pt), _) => casePat(pt) match {
              case Some((gn, gcls)) if gn == names && patCls.contains(gcls) =>
                Some(bindSyms(pt))
              case _ => None
            }
            case _ => None
          }
        specT.flatMap { case (spec, patCls) =>
          val names = spec.map(_._1)
          val clsSimple = patCls.map(_.name.toString)
          // scalac's check$ifrefutable guard is the identity here (the
          // pattern is an irrefutable tuple of plain binds over a tuple
          // yield) and the pattern disappears entirely after substitution
          // — drop it on both the typed and the untyped side
          val realGuards = tg.guards.filterNot(isRefutCheckGuard)
          val gSpecs = realGuards.map(g => guardSpec(g, names, patCls))
          // the components substituted for the binder(s)
          val typedComps: List[Tree] =
            if (spec.head._3 == -1) List(typedE)
            else caseYield(typedE, patCls.get).get
          // capture safety: the substituted expressions' free names must
          // not be re-bound inside the trees they are substituted into
          // (nor collide with the bind names — sequential substitution
          // must not rewrite inside an earlier replacement); the moved
          // downstream/guard trees' free names must not collide with the
          // inner chain's binders they move under
          val freeE = typedComps.iterator.flatMap(freeTermNames).toSet
          val nameSet = names.toSet
          val movedOk = gSpecs.forall(_.isDefined) &&
            (freeE & nameSet).isEmpty &&
            (freeE & boundNamesIn(restT)).isEmpty &&
            realGuards.forall(g => (freeE & boundNamesIn(g.cond)).isEmpty) &&
            ((freeTermNames(restT) -- nameSet) & inner).isEmpty &&
            realGuards.forall(g =>
              ((freeTermNames(g.cond) -- nameSet) & inner).isEmpty)
          if (dbg) trace(s"spec=$spec gSpecs=$gSpecs freeE=$freeE nameSet=$nameSet " +
            s"inner=$inner movedOk=$movedOk guards=${realGuards.map(g =>
              (g.v.name, g.pat.map(showRaw(_)), showRaw(g.cond).take(200)))}")
          if (!movedOk) None
          else {
            val expectRest = spec.map { case (_, s, _) => symRefCount(restT, s) }
            val expectGuards = realGuards.zip(gSpecs).map { case (g, gs) =>
              gs.get.map(symRefCount(g.cond, _))
            }
            // substitute every (name -> component) pair, verifying counts
            def substAll(t: Tree, comps: List[Tree], expect: List[Int]): Option[Tree] = {
              val (res, ok) = names.zip(comps).zip(expect)
                .foldLeft((t, true)) { case ((acc, good), ((n, rep), exp)) =>
                  if (!good) (acc, false)
                  else {
                    val (nt, cnt) = substFreeName(acc, n, rep)
                    (nt, cnt == exp)
                  }
                }
              if (ok) Some(res) else None
            }
            val u = c.untypecheck(expr)
            nodeAt(u, i).flatMap { un =>
              un match {
                case Call1(recvU, mU, GenLam(uv, upat, restU)) if mU == mT &&
                    ((upat.isEmpty && ypatT.isEmpty && uv.name == names.head) ||
                      (upat.nonEmpty && ypatT.nonEmpty && clsSimple.exists(cs =>
                        upat.flatMap(untypedPatNames(_, cs)).contains(names)))) =>
                  val (ibagU0, yGuardsU0) = FilterChain.unapply(recvU).get
                  val ibagU = stripRefutCheck(ibagU0)
                  val yGuardsU = yGuardsU0.filterNot(isRefutCheckGuard)
                  if (yGuardsU.length != realGuards.length) None
                  else {
                    def spliceU(t: Tree): Option[Tree] = t match {
                      case Call1(base, TermName("map"), GenLam(zv, zpat, e)) =>
                        val compsU: Option[List[Tree]] =
                          if (spec.head._3 == -1) Some(List(e))
                          else clsSimple.flatMap(cs =>
                            untypedCtorComps(e, cs, names.length))
                        compsU.flatMap { cs =>
                          val subGs = yGuardsU.zip(expectGuards).map {
                            case (g, exp) => substAll(g.cond, cs, exp)
                          }
                          val newRest = substAll(restU, cs, expectRest)
                          if (subGs.exists(_.isEmpty) || newRest.isEmpty) None
                          else {
                            val guarded = subGs.flatten.foldLeft(base)((b, gc) =>
                              q"$b.withFilter(${binderLam(zv.name, zpat, gc)})")
                            Some(q"$guarded.$mU(${binderLam(zv.name, zpat, newRest.get)})")
                          }
                        }
                      case Call1(base, TermName("flatMap"), GenLam(zv, zpat, body)) =>
                        spliceU(body).map(r =>
                          q"$base.flatMap(${binderLam(zv.name, zpat, r)})")
                      case _ => None
                    }
                    spliceU(ibagU).map { newNode =>
                      q"_root_.graft.api.comprehensions.onSpark(${substituteTrees(u, List((un, newNode)))})"
                    }
                  }
                case _ => None
              }
            }
          }
        }
      }
    }
  }

  // ------------------------------------------------------ rebuild (untyped)

  /** How level j binds when re-destructured from the join tuple. */
  private case class Binder(name: TermName, pat: Option[Tree])

  /** Accessor for variable j (1-based) in the stage-i nested pair
    * ((...(v1,v2),v3)...,vi). */
  private def accessor(p: TermName, j: Int, i: Int): Tree = {
    val down = (1 to (i - j)).foldLeft(q"$p": Tree)((t, _) => q"$t._1")
    if (j > 1) q"$down._2" else down
  }

  /** Binds levels 1..i from the stage-i nested pair under a fresh param:
    * plain levels as vals, pattern levels by re-matching the pattern.
    * `lastOverride` substitutes level i's binder (guard and map lambdas
    * carry their own parameter names / patterns). */
  private def bound(binders: Seq[Binder], i: Int, inner: Tree,
      lastOverride: Option[Binder] = None): Tree = {
    val p = TermName(c.freshName("p$"))
    val body = (1 to i).foldRight(inner) { (j, acc) =>
      val b = if (j == i) lastOverride.getOrElse(binders(j - 1)) else binders(j - 1)
      val a = accessor(p, j, i)
      b.pat match {
        case Some(pt) => Match(a, List(CaseDef(pt, EmptyTree, acc)))
        case None => q"{ val ${b.name} = $a; $acc }"
      }
    }
    lam(p, body)
  }

  /** [[bound]] whose inner tree may reference the tuple param itself
    * (the dependent-generator lowering pairs the WHOLE stage tuple with
    * each inner element). */
  private def boundRef(binders: Seq[Binder], i: Int, mk: TermName => Tree): Tree = {
    val p = TermName(c.freshName("p$"))
    val body = (1 to i).foldRight(mk(p)) { (j, acc) =>
      val b = binders(j - 1)
      val a = accessor(p, j, i)
      b.pat match {
        case Some(pt) => Match(a, List(CaseDef(pt, EmptyTree, acc)))
        case None => q"{ val ${b.name} = $a; $acc }"
      }
    }
    lam(p, body)
  }

  // ------------- opt-in broadcast lowering for hinted guard membership

  /** The reference auto-lowers a driver bag referenced inside an engine
    * lambda to `broadcast`/`bag` pairs (emma-spark SparkBackend.scala:
    * 66-117, SparkNtv.scala:88-97) or `.collect()` materialization
    * (GenericSpecialization.scala:83-139) — unconditionally. Graft keeps
    * the blanket ABORT for the general capture (an unbounded silent
    * collect is a scale cliff) and derives the broadcast form only on the
    * user's explicit `.broadcasted` hint: a guard anchor
    * `small.broadcasted.exists(p)` / `.forall(p)` whose bag is
    * generator-independent, in a guard the semi-join and fold-comparison
    * derivations DECLINE (exactly where abortBagGuard fires today — e.g.
    * a RANGE membership `k > lo(x) && k < hi(x)`), rewrites to a hoisted
    * `val bc = BroadcastBag(small)` (one driver collect + one torrent
    * broadcast, element-count bounded) with the anchor becoming
    * `bc.exists(p)` inside the plain filter closure. Derivable guards
    * (equality-keyed membership) are left to the superior distributed
    * semi-join lowering — the hint there stays a join hint. Un-hinted
    * captures keep the abort (spec-pinned). */
  private def hoistBroadcastGuards(expr: Tree, gens: List[Gen]): Option[Tree] = {
    object BroadcastAnchor {
      def unapply(t: Tree): Option[(Tree, TermName, Tree)] = t match {
        case Apply(Select(Select(bag, TermName("broadcasted")), q: TermName),
            List(pred)) if q.toString == "exists" || q.toString == "forall" =>
          Some((bag, q, pred))
        case _ => None
      }
    }
    val allGenSyms = gens.flatMap(levelSyms)
    val allDefs = defSymsIn(expr)
    // typed decisions, positional per guard: preorder anchor booleans
    // (inside a claimed anchor only the PREDICATE is descended — the bag
    // expr hoists whole, so anchors inside it must not be re-claimed)
    final case class GuardPlan(gi: Int, ji: Int, decisions: List[Boolean])
    val plans = scala.collection.mutable.ListBuffer.empty[GuardPlan]
    for ((g, gi) <- gens.zipWithIndex; (gd, ji) <- g.guards.zipWithIndex) {
      val derivable =
        semiPlanOf(allGenSyms ++ guardSyms(gd), gd.cond).isDefined ||
          guardFoldsOf(allGenSyms ++ guardSyms(gd), gd.cond).isDefined
      val hasAnchor = gd.cond.exists {
        case BroadcastAnchor(_, _, _) => true
        case _ => false
      }
      if (!derivable && hasAnchor) {
        val ds = scala.collection.mutable.ListBuffer.empty[Boolean]
        val trav = new Traverser {
          override def traverse(t: Tree): Unit = t match {
            case BroadcastAnchor(bag, _, pred) =>
              val ok = isDataBag(bag) && distributedValueRef(bag).isDefined &&
                !usesAny(bag, (allDefs -- defSymsIn(bag)).toSeq)
              ds += ok
              if (ok) traverse(pred) else super.traverse(t)
            case _ => super.traverse(t)
          }
        }
        trav.traverse(gd.cond)
        if (ds.contains(true)) plans += GuardPlan(gi, ji, ds.toList)
      }
    }
    if (plans.isEmpty) return None
    val uexpr = c.untypecheck(expr)
    flatten(uexpr) match {
      case Some((ugens, _)) if ugens.length == gens.length =>
        // one BroadcastBag per distinct bag expression (by rendered code)
        val bcByCode =
          scala.collection.mutable.LinkedHashMap.empty[String, (TermName, Tree)]
        val reps = scala.collection.mutable.ListBuffer.empty[(Tree, Tree)]
        for (pl <- plans) {
          // fail CLOSED on any positional mismatch: silently skipping
          // would leave the DataBag ctor inside the emitted closure — a
          // runtime crash where the abort is guaranteed today
          if (pl.ji >= ugens(pl.gi).guards.length)
            c.abort(c.enclosingPosition,
              "onSpark: internal — guard positions changed after " +
              "untypecheck while lowering a `.broadcasted` guard; " +
              "restructure the guard or join explicitly")
          val uCond = ugens(pl.gi).guards(pl.ji).cond
          var i = 0
          val tf = new Transformer {
            override def transform(t: Tree): Tree = t match {
              case BroadcastAnchor(bag, q, pred) =>
                val d = i < pl.decisions.length && pl.decisions(i)
                i += 1
                if (d) {
                  val (n, _) = bcByCode.getOrElseUpdate(showCode(bag),
                    (TermName(c.freshName("bc$")), bag))
                  Apply(Select(Ident(n), q), List(transform(pred)))
                } else super.transform(t)
              case _ => super.transform(t)
            }
          }
          val nCond = tf.transform(uCond)
          if (i != pl.decisions.length)
            c.abort(c.enclosingPosition,
              "onSpark: internal — `.broadcasted` guard anchors changed " +
              "after untypecheck; restructure the guard or join explicitly")
          reps += ((uCond, nCond))
        }
        val vals = bcByCode.values.toList.map { case (n, bag) =>
          q"val $n = _root_.graft.api.BroadcastBag($bag)"
        }
        Some(q"{ ..$vals; _root_.graft.api.comprehensions.onSpark(${
          substituteTrees(uexpr, reps.toList)}) }")
      case _ => None
    }
  }

  // ------------- scalar-val inlining in guard/yield positions (ANF-inverse)

  /** The reference's Core/ANF normalization lets fold fusion and the
    * global-fold hoist see THROUGH local `val` bindings (an inlined
    * `stat.variance` binds `val means = mean(D)(xs)` before folding the
    * bag again — emma-lib/.../stats/stat.scala:40-55; emma normalizes the
    * whole program to Core, lang/core/Core.scala, so the binding is
    * transparent there). The macro equivalent: when a guard or yield
    * contains a Block-local scalar `val` whose rhs is BAG-FREE (after an
    * earlier hoist round replaced its folds with driver locals) and whose
    * value is read INSIDE a distributed-bag fold/quantifier anchor —
    * poisoning that anchor's generator-independence — the val inlines
    * into its occurrences (count-verified against the typed symbol
    * counts; any disagreement declines) and the macro re-expands: the
    * anchor is then independent and hoists, or correlates and derives.
    * Bag-free-rhs inlining is plan-neutral for already-derivable shapes
    * (no fold subtree changes), and the comprehension-calculus purity
    * contract licenses the duplicated evaluation — the same premise as
    * beta reduction's direct argument substitution. One val per pass;
    * re-expansion iterates to a fixpoint. */
  private def inlineScalarPositionVals(expr: Tree, gens: List[Gen],
      tbody: Tree): Option[Tree] = {
    val positionsT: List[Tree] = tbody :: gens.flatMap(_.guards.map(_.cond))
    // does a distributed-bag-rooted fold/quantifier anchor in `p` read the
    // val? (that read is exactly what blocks the anchor's hoist/derive)
    def blockedAnchorUses(p: Tree, sym: Symbol): Boolean = {
      var found = false
      val trav = new Traverser {
        override def traverse(t: Tree): Unit = t match {
          case GlobalAnchor(recv) if isDataBag(recv) && uses(t, sym) =>
            found = true
          case _ => super.traverse(t)
        }
      }
      trav.traverse(p)
      found
    }
    // typed pick: first eligible val, position-major preorder; valIdx
    // counts ALL ValDefs in preorder so the untyped twin pairs positionally
    case class Pick(posIdx: Int, valIdx: Int, name: TermName, expect: Int)
    var pick: Option[Pick] = None
    for ((p, pi) <- positionsT.zipWithIndex if pick.isEmpty) {
      var vi = -1
      p.foreach {
        case vd: ValDef =>
          vi += 1
          if (pick.isEmpty &&
              !vd.mods.hasFlag(Flag.PARAM) && !vd.mods.hasFlag(Flag.LAZY) &&
              !vd.mods.hasFlag(Flag.MUTABLE) && vd.rhs.nonEmpty &&
              vd.symbol != null && vd.symbol != NoSymbol &&
              !isDataBag(vd.rhs) &&
              distributedValueRef(vd.rhs).isEmpty &&
              !vd.rhs.exists(isLocalBagCtor) &&
              blockedAnchorUses(p, vd.symbol)) {
            val n = symRefCount(p, vd.symbol)
            if (n > 0) pick = Some(Pick(pi, vi, vd.name, n))
          }
        case _ => ()
      }
    }
    pick.flatMap { pk =>
      val uexpr = c.untypecheck(expr)
      flatten(uexpr).flatMap { case (ugens, ubody) =>
        val positionsU: List[Tree] = ubody :: ugens.flatMap(_.guards.map(_.cond))
        if (positionsU.length != positionsT.length) None
        else {
          val uPos = positionsU(pk.posIdx)
          var vi = -1
          var target: Option[ValDef] = None
          uPos.foreach {
            case vd: ValDef =>
              vi += 1
              if (vi == pk.valIdx && target.isEmpty) target = Some(vd)
            case _ => ()
          }
          target.filter(_.name == pk.name).flatMap { uVal =>
            // remove the val from its Block, then substitute name -> rhs
            // in what remains (the rhs is gone with the stat, so no
            // self-substitution is possible)
            var removed = false
            val rm = new Transformer {
              override def transform(t: Tree): Tree = t match {
                case b @ Block(stats, e) if !removed && stats.exists(_ eq uVal) =>
                  removed = true
                  val kept = stats.filterNot(_ eq uVal).map(transform)
                  val ne = transform(e)
                  if (kept.isEmpty) ne else treeCopy.Block(b, kept, ne)
                case _ => super.transform(t)
              }
            }
            val without = rm.transform(uPos)
            if (!removed) None
            else {
              val (sub, cnt) = substFreeName(without, pk.name, uVal.rhs)
              if (cnt != pk.expect) None
              else Some(q"_root_.graft.api.comprehensions.onSpark(${
                substituteTrees(uexpr, List((uPos, sub)))})")
            }
          }
        }
      }
    }
  }

  def onSpark[T: c.WeakTypeTag](expr: c.Tree): c.Tree = expandTop(expr)

  /** One full expansion pass over a TYPED tree — the body behind the
    * `onSpark` entry, directly recursable: [[deepRewrite]] calls it on
    * chain subtrees found in driver-side positions of non-chain
    * expressions (wrapping those subtrees in nested `onSpark` calls
    * instead corrupts either materialized-encoder TypeCreator trees on a
    * second untypecheck, or symbol owner chains when the typed subtree is
    * re-parented). */
  private def expandTop(expr: Tree): Tree = {
    val typedChain = flatten(expr)
    // a MUTABLE variable captured inside a quoted lambda is a silent
    // wrong-answer trap left alone: Datasets defer execution, so a later
    // job re-evaluates the guard/yield with the variable's LATEST value —
    // the classic fixpoint-loop bug the reference compiles away with
    // DSCF's loop-var-to-parameter conversion (lang/core/DSCF.scala).
    // The macro applies the SAME semantics here: each captured var is
    // snapshot into a val at chain-BUILD time and every reference in the
    // chain substitutes (count-verified against the typed symbol counts;
    // shadowing poisons the count and aborts instead of mis-capturing),
    // then the macro re-expands. The reference's quoted sieve runs
    // verbatim under this rule. Var reads in BAG position alone need no
    // snapshot (chains build eagerly) but substituting them is the same
    // moment, so all references rewrite uniformly.
    typedChain match {
      case Some((gens, tbody)) if gens.nonEmpty && isDataBag(gens.head.bag) =>
        // scan guards, the yield, AND the generator BAG expressions: a
        // lambda inside a bag expr (a groupBy key, a map stage) defers and
        // distributes exactly like a guard; non-lambda bag-position var
        // reads evaluate at build time anyway, so the uniform snapshot is
        // semantics-preserving for them too
        val lambdaTrees = gens.flatMap(_.guards.map(_.cond)) ++
          gens.map(_.bag) :+ tbody
        // qualified member-var reads (this.x / obj.x) cannot be snapshot by
        // the name substitution below — abort rather than defer the read.
        // Guards and the yield always land in lambdas (scan everywhere);
        // BAG expressions evaluate eagerly at build except under a lambda
        // of their own (a groupBy key) — lambda-only scan there, so
        // `for (x <- this.bagVar) ...` stays compilable
        val memberReads =
          ((gens.flatMap(_.guards.map(_.cond)) :+ tbody)
            .flatMap(t => memberVarSelects(t)) ++
          gens.map(_.bag)
            .flatMap(t => memberVarSelects(t, insideLambdaOnly = true))).distinct
        if (memberReads.nonEmpty)
          c.abort(c.enclosingPosition,
            s"onSpark: the quoted comprehension reads or writes the mutable field(s) " +
            s"${memberReads.map(_.name.toString.stripSuffix("_$eq")).distinct.mkString(", ")} " +
            "through a qualifier inside a lambda; Spark defers execution (and runs " +
            "lambdas on executors, where a write never propagates back) — snapshot " +
            "reads manually (`val v0 = this.v` before the comprehension) and fold " +
            "into a driver-side result instead of assigning")
        val captured: List[Symbol] = lambdaTrees.flatMap(varCaptureSyms).distinct
        if (captured.nonEmpty) {
          val expects = captured.map(s => symRefCount(expr, s))
          val fresh = captured.map(s =>
            TermName(c.freshName(s.name.toString + "$dscf")))
          var cur = c.untypecheck(expr)
          var ok = true
          captured.zip(fresh).zip(expects).foreach { case ((s, f), exp) =>
            if (ok) {
              val (nt, cnt) = substFreeName(cur, s.name.toTermName, Ident(f))
              if (cnt == exp && exp > 0) cur = nt else ok = false
            }
          }
          if (!ok)
            c.abort(c.enclosingPosition,
              s"onSpark: the quoted comprehension captures the mutable variable(s) " +
              s"${captured.map(_.name).mkString(", ")} inside a lambda, and a " +
              "same-named binder prevents the automatic build-time snapshot; " +
              "Spark defers execution, so a later job would observe the variable's " +
              "latest value — snapshot it manually: `val v0 = v` and use `v0`")
          val defs = captured.zip(fresh).map { case (s, f) =>
            q"val $f = ${Ident(s.name.toTermName)}"
          }
          return q"{ ..$defs; _root_.graft.api.comprehensions.onSpark($cur) }"
        }
      case _ => ()
    }
    // generator-independent folds of a distributed bag hoist FIRST into
    // driver vals (the uncorrelated scalar subquery), then the macro
    // re-expands on the rewritten comprehension
    typedChain match {
      case Some((gens, _)) if gens.nonEmpty && isDataBag(gens.head.bag) =>
        hoistGlobalFolds(expr) match {
          case Some(res) => return res
          case None => ()
        }
      case _ => ()
    }
    // `.broadcasted`-hinted guard membership the join derivations cannot
    // claim lowers to a hoisted BroadcastBag + closure predicate (the
    // reference's broadcast/bag insertion, opt-in) instead of aborting
    typedChain match {
      case Some((gens, _)) if gens.nonEmpty && isDataBag(gens.head.bag) =>
        hoistBroadcastGuards(expr, gens) match {
          case Some(res) => return res
          case None => ()
        }
      case _ => ()
    }
    // Block-local scalar vals (bag-free rhs) read inside a bag anchor
    // inline so the anchor's independence becomes visible — the
    // ANF-inverse the spliced stat.variance shape needs (method doc)
    typedChain match {
      case Some((gens, tbody)) if gens.nonEmpty && isDataBag(gens.head.bag) =>
        inlineScalarPositionVals(expr, gens, tbody) match {
          case Some(res) => return res
          case None => ()
        }
      case _ => ()
    }
    // Group-PATTERN generators over groupBy bags desugar to plain-binder
    // lambdas reading .key/.values, then re-expand (so the fusion passes
    // below all apply to the pattern spelling too)
    typedChain match {
      case Some((gens, _)) if gens.nonEmpty && isDataBag(gens.head.bag) =>
        rewriteGroupPatterns(expr, gens) match {
          case Some(res) => return res
          case None => ()
        }
      case _ => ()
    }
    // groupBy generators in MULTI-generator chains pre-rewrite to fused
    // foldGroups (the single-generator case fuses below, guards included)
    typedChain match {
      case Some((gens, tbody)) if gens.length >= 2 && isDataBag(gens.head.bag) &&
          gens.tail.forall(g => isDataBag(g.bag)) =>
        fuseMultiGroupBys(expr, gens, tbody) match {
          case Some(res) => return res
          case None => ()
        }
      case _ => ()
    }
    // a DEPENDENT generator whose bag is itself a comprehension chain
    // splices into the outer chain (the reference's UnnestGenerator,
    // Normalize.scala:44-52) and the macro re-expands — the former inner
    // guards then derive joins as ordinary cross-variable guards
    typedChain match {
      case Some((gens, _)) if gens.length >= 2 && isDataBag(gens.head.bag) =>
        unnestGenerators(expr, gens) match {
          case Some(res) => return res
          case None => ()
        }
      case _ => ()
    }
    // SAME-OBJECT helper `def`s inline by beta reduction (the reference's
    // Lib.expand) and re-expand: dependent generator bags (symbol-precise)
    // and DataBag-returning calls in guard/yield positions (name-based) —
    // the spliced chain then unnests / derives correlated folds like its
    // written-out spelling
    typedChain match {
      case Some((gens, tbody)) if gens.nonEmpty && isDataBag(gens.head.bag) =>
        inlineHelperDefs(expr, gens, tbody) match {
          case Some(res) => return res
          case None => ()
        }
      case _ => ()
    }
    // groupBy-fusion applicability, computed ONCE (the validation walks
    // the whole yield + guards)
    val groupFusionInfo: Option[(List[GroupFoldOcc], List[List[GroupFoldOcc]])] =
      typedChain match {
        case Some((List(gen), tbody)) => groupFusionOf(gen, tbody)
        case _ => None
      }
    typedChain match {
      case Some((gens, tbody)) if gens.length >= 2 && isDataBag(gens.head.bag) &&
          gens.tail.exists(g => isDataBag(g.bag)) =>
        val symsEarly = gens.map(levelSyms)
        // correlated scalar folds in the yield derive as pre-aggregate +
        // left outer join (the reference's FoldGroupFusion shape); any
        // OTHER distributed bag captured inside the yield is a guaranteed
        // executor-side crash — abort with guidance now
        val headFolds = collectFoldCalls(tbody,
          foldPlanAt(symsEarly.flatten, tbody))
        for (r <- distributedRefOutside(tbody,
            headFolds.collect { case (t, Some(_)) => t }))
          abortBagHead(r)
        val headHasCtor = tbody.exists(isLocalBagCtor)
        val headCtorNames = ctorNamesIn(tbody)
        val allNames = gens.flatMap(g => g.pat.map(bindNames).getOrElse(List(g.v.name)))
        if (allNames.distinct.length != allNames.length)
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
            s"onSpark: generator '${gen.display}' is not a DataBag — mixing DataBag and " +
            "local-collection generators is not derived; lift the local collection into a " +
            "DataBag or restructure")
        // every later bag must be independent of earlier generators — with
        // two derived exceptions: the dependent-FILTER spelling
        // (ys.withFilter(y => k(x) == g(y))) is already peeled into a
        // guard by FilterChain and derives a join, and a dependent bag
        // that is a LITERAL `DataBag(expr)` constructor is provably local
        // per element, so it lowers to the reference's MatchFlatMap1
        // flatMap (the inner Seq is driver-shaped, never a job per row).
        // What remains aborted is a DISTRIBUTED bag built from an earlier
        // row — the one-job-per-element cliff.
        val syms = symsEarly
        // quantified guards (EXISTS over an independent distributed bag)
        // derive semi/anti joins; any OTHER guard that captures a
        // distributed bag would crash in an executor closure — abort
        val allGenSyms = syms.flatten
        // a guard's binder for the CURRENT level is its own lambda's
        // param/pattern symbols (guardSyms), not the generator lambda's —
        // both count as comprehension variables for key separation
        val semiPlans: List[List[Option[SemiPlan]]] =
          gens.map(_.guards.map(g => semiPlanOf(allGenSyms ++ guardSyms(g), g.cond)))
        // guards comparing correlated fold values (the HAVING shape)
        // derive sumJoin + filter + project-back
        val guardFoldPlans: List[List[Option[GuardFolds]]] =
          gens.zip(semiPlans).map { case (gen, sp) =>
            gen.guards.zip(sp).map {
              case (_, Some(_)) => None
              case (g, None) => guardFoldsOf(allGenSyms ++ guardSyms(g), g.cond)
            }
          }
        // a GUARD whose condition comprehends over literal DataBag(seq)
        // ctors — and references no other distributed bag — localizes onto
        // LocalBag exactly like the yield (r14: the reference's Normalize
        // treats every position alike; until now only the head localized
        // and guards aborted). A REAL distributed reference still aborts.
        val guardLocal: List[List[Option[Set[TermName]]]] =
          gens.zip(semiPlans).zip(guardFoldPlans).map { case ((gen, sp), gf) =>
            gen.guards.zip(sp).zip(gf).map {
              case ((g, None), None)
                  if g.cond.exists(isLocalBagCtor) &&
                    distributedValueRef(g.cond).isEmpty =>
                Some(ctorNamesIn(g.cond))
              case _ => None
            }
          }
        for (((gen, plans), gfs) <- gens.zip(semiPlans).zip(guardFoldPlans);
             ((g, p), gf) <- gen.guards.zip(plans).zip(gfs)
             if p.isEmpty && gf.isEmpty;
             r <- distributedValueRef(g.cond))
          abortBagGuard(r)
        val depLocal: Set[Int] = gens.zipWithIndex.drop(1).collect {
          case (gen, i) if usesAny(gen.bag, syms.take(i).flatten) &&
              isLocalBagCtor(gen.bag) && gen.pat.isEmpty => i
        }.toSet
        for ((gen, i) <- gens.zipWithIndex.drop(1)) {
          if (usesAny(gen.bag, syms.take(i).flatten) && !depLocal(i))
            c.abort(c.enclosingPosition,
              s"onSpark: generator '${gen.display}' depends on an earlier generator variable; " +
              "only a literal DataBag(seq) inner bag (with a plain, non-pattern binder) is " +
              "derived as a local flatMap — join explicitly or restructure")
        }
        // a dependent-local level's guards all post-filter the flatMapped
        // pair (its inner bag is local and per-element small; no join to key)
        val claimed = semiPlans.zip(guardFoldPlans).map { case (sp, gf) =>
          sp.zip(gf).map { case (s, f) => s.isDefined || f.isDefined }
        }
        val roles = analyze(gens, claimed).zipWithIndex.map { case (rs, k) =>
          if (depLocal(k + 1)) rs.map(_ => PostFilter: GuardRole) else rs
        }
        // rebuild from a single whole-expression untypecheck
        flatten(c.untypecheck(expr)) match {
          case Some((ugens0, ubody)) =>
            // localize ctor-comprehending guard conditions (decision matrix
            // from the typed pass, applied positionally). FAIL CLOSED on a
            // positional mismatch when localization was DECIDED: silently
            // skipping would leave the DataBag ctor inside the emitted
            // withFilter closure — a runtime executor crash where the old
            // code guaranteed a compile-time abort (same backstop
            // discipline as localizeHead's residual-ctor check)
            val ugens = ugens0.zipWithIndex.map { case (ug, gi) =>
              val gl = guardLocal(gi)
              if (gl.forall(_.isEmpty)) ug
              else if (gl.length != ug.guards.length)
                c.abort(c.enclosingPosition,
                  "onSpark: a guard comprehends over a literal DataBag(seq) " +
                  "constructor, but the guard positions changed after " +
                  "untypecheck so the localization cannot be applied — " +
                  "hoist the inner bag into a driver val or fold outside " +
                  "the comprehension")
              else ug.copy(guards = ug.guards.zip(gl).map {
                case (gd, Some(names)) => gd.copy(cond = localizeHead(gd.cond, names))
                case (gd, None) => gd
              })
            }
            val binders = ugens.map(g => Binder(g.v.name, g.pat))
            val head = ugens.head
            // level-1 guards reference only level 1: pre-filter the first
            // bag (quantified guards semi/anti-join it)
            val first = head.guards.zip(semiPlans.head).zip(guardFoldPlans.head)
              .foldLeft(head.bag) {
                case (acc, ((g, Some(plan)), _)) =>
                  lowerSemi(acc, g, plan, o => binderLam(g.v.name, g.pat, o))
                case (acc, ((g, None), Some(gf))) =>
                  lowerGuardFolds(acc, g, gf, List(Binder(g.v.name, g.pat)))
                case (acc, ((g, None), None)) =>
                  q"$acc.withFilter(${binderLam(g.v.name, g.pat, g.cond)})"
              }
            val joinedAll = ugens.zip(roles.map(Some(_)).prepended(None))
              .zipWithIndex.drop(1)
              .foldLeft(first) { case (acc, ((gen, Some(levelRoles)), idx)) =>
                val i = idx + 1 // 1-based stage AFTER this join
                // quantified and fold-comparing guards leave the role
                // machinery (their role slot is garbage) and apply after
                // the level's join; everything else keeps its analyzed role
                val tagged = gen.guards.zip(levelRoles).zip(semiPlans(idx))
                  .zip(guardFoldPlans(idx))
                  .map { case (((g, role), sp), gf) => (g, role, sp, gf) }
                val own = tagged.collect {
                  case (g, OwnFilter, None, None) => g }
                val keys = tagged.collect {
                  case (g, JoinKey(sw), None, None) => (g, sw) }
                val post = tagged.collect {
                  case (g, PostFilter, None, None) => g }
                val semis = tagged.collect {
                  case (g, _, Some(plan), _) => (g, plan) }
                val gfolds = tagged.collect {
                  case (g, _, None, Some(gf)) => (g, gf) }
                val bag = own.foldLeft(gen.bag) { case (b, g) =>
                  q"$b.withFilter(${binderLam(g.v.name, g.pat, g.cond)})"
                }
                val joined = if (depLocal(idx)) {
                  // MatchFlatMap1: acc.flatMap(p => seq.map(y => (p, y))) —
                  // the inner Seq (the DataBag ctor's argument) references
                  // earlier vars, bound as vals from the stage tuple
                  val seqArg = localBagArg(gen.bag).getOrElse(
                    c.abort(c.enclosingPosition,
                      "internal: dependent-local bag shape changed after untypecheck"))
                  val y = gen.v.name
                  q"$acc.flatMap(${boundRef(binders, i - 1, p =>
                    q"$seqArg.map(${lam(y, q"(${Ident(p)}, ${Ident(y)})")})")})"
                } else keys match {
                  case Nil =>
                    q"$acc.cross($bag)"
                  case List((g, swapped)) =>
                    val (accSide, newSide) = g.cond match {
                      case Eq(l, r) => if (swapped) (r, l) else (l, r)
                      case _ => c.abort(c.enclosingPosition, "internal: key guard shape changed")
                    }
                    // key over the accumulated tuple: bind levels 1..i-1
                    val kAcc = bound(binders, i - 1, accSide)
                    val kNew = binderLam(g.v.name, g.pat, newSide)
                    q"$acc.equiJoin($bag)($kAcc, $kNew)"
                  case more =>
                    // COMPOSITE key: every equality guard contributes one
                    // slot; the new-side tuple evaluates each guard's
                    // expression under its OWN binder scope (shared-name
                    // patterns must not cross-capture — underChainBinder)
                    val sides = more.map { case (g, swapped) =>
                      g.cond match {
                        case Eq(l, r) => if (swapped) ((r, l), g) else ((l, r), g)
                        case _ => c.abort(c.enclosingPosition,
                          "internal: key guard shape changed")
                      }
                    }
                    val kAcc = bound(binders, i - 1,
                      q"(..${sides.map(_._1._1)})")
                    val fp = TermName(c.freshName("k$"))
                    val slots = sides.map { case ((_, newSide), g) =>
                      underChainBinder(fp, (g.v.name, g.pat), newSide)
                    }
                    val kNew = lam(fp, q"(..$slots)")
                    q"$acc.equiJoin($bag)($kAcc, $kNew)"
                }
                // demoted / mixed guards filter the joined pair; the guard's
                // own binder (name or pattern) binds the NEW side
                val filtered = post.foldLeft(joined) { case (j, g) =>
                  q"$j.withFilter(${bound(binders, i, g.cond, Some(Binder(g.v.name, g.pat)))})"
                }
                // quantified guards: semi/anti join the stage tuple (the
                // outer key rebinds levels 1..i, the guard's own binder
                // covers the new side — the post-filter pattern)
                val afterSemis = semis.foldLeft(filtered) { case (j, (g, plan)) =>
                  lowerSemi(j, g, plan,
                    o => bound(binders, i, o, Some(Binder(g.v.name, g.pat))))
                }
                // fold-comparing guards: widen with the fold values,
                // filter, project the stage tuple back
                gfolds.foldLeft(afterSemis) { case (j, (g, gf)) =>
                  lowerGuardFolds(j, g, gf,
                    binders.take(i).toList.updated(i - 1, Binder(g.v.name, g.pat)))
                }
              case (acc, ((_, None), _)) => acc
            }
            // correlated head folds: one sumJoin per derived fold — the
            // fold value rides as one more pair level of the stage tuple
            // (the untyped twins pair positionally with the typed pass)
            val ufolds = collectFoldCallsReplay(ubody, headFolds.map(_._2.isDefined))
            if (ufolds.length != headFolds.length)
              c.abort(c.enclosingPosition,
                "internal: head folds changed after untypecheck")
            val derivedF = ufolds.zip(headFolds.map(_._2))
              .collect { case (t, Some(p)) => (t, p) }
            val foldNames = derivedF.map(_ => TermName(c.freshName("fold$")))
            val foldBinders = foldNames.map(n => Binder(n, None))
            val withFolds = lowerFoldChain(joinedAll, derivedF,
              j => o => bound(binders ++ foldBinders.take(j), ugens.length + j, o))
            val substituted = substituteAll(ubody, derivedF.map(_._1).zip(foldNames))
            val body = if (headHasCtor) localizeHead(substituted, headCtorNames)
              else substituted
            q"$withFolds.map(${bound(binders ++ foldBinders, ugens.length + derivedF.length, body)})"
          case None =>
            c.abort(c.enclosingPosition,
              "internal: untypechecked tree no longer matches the comprehension shape")
        }

      // groupBy comprehension — the reference's FoldGroupFusion
      // (FoldGroupFusion.scala:49-82): `for { g <- xs.groupBy(k); if
      // <folds of g.values> } yield <g.key / folds of g.values>` rewrites
      // to ONE fused foldGroup (map-side partial aggregation over an
      // Alg2-composed algebra; groups never materialize), guards filter
      // the aggregated rows, the yield reads the algebra tuple.
      // Non-fusible shapes (bare `g`, `g.values` outside a fold, pattern
      // binders) pass through to the unfused groupBy — correct, just
      // group-materializing.
      case Some((gens, tbody)) if gens.length == 1 && groupFusionInfo.isDefined =>
        val _ = (gens, tbody)
        val (tBodyFolds, tGuardFolds) = groupFusionInfo.get
        flatten(c.untypecheck(expr)) match {
          case Some((List(ug), ubody)) =>
            def isRootU(n: TermName): Tree => Boolean = {
              case Select(Ident(m: TermName), TermName("values")) => m == n
              case _ => false
            }
            val (xsU, kLamU) = ug.bag match {
              case Call1(q, TermName("groupBy"), kl) => (q, kl)
              case _ => c.abort(c.enclosingPosition,
                "internal: groupBy shape changed after untypecheck")
            }
            def isIdentU(n: TermName): Tree => Boolean = {
              case Ident(m: TermName) => m == n
              case _ => false
            }
            val ubodyI = inlineGroupAliases(ubody, isIdentU(ug.v.name))
            val guardCondsI =
              ug.guards.map(gd => inlineGroupAliases(gd.cond, isIdentU(gd.v.name)))
            val uBodyFolds = collectGroupFolds(ubodyI, isRootU(ug.v.name))
            val uGuardFolds = ug.guards.zip(guardCondsI).map {
              case (gd, cond) => collectGroupFolds(cond, isRootU(gd.v.name))
            }
            // the typed pass matched by SYMBOL, this one by NAME — a
            // shadowing inner binder would silently mis-fuse, so require
            // exact agreement
            if (uBodyFolds.length != tBodyFolds.length ||
                uGuardFolds.map(_.length) != tGuardFolds.map(_.length))
              c.abort(c.enclosingPosition,
                "onSpark: an inner binder shadows the Group binder inside the " +
                "comprehension — rename it so the fused rewrite can tell which " +
                "`.values` folds belong to the group")
            val all = uGuardFolds.flatten ++ uBodyFolds
            val algsConvs = all.map(groupFoldAlg)
            val algTree = algsConvs.map(_._1)
              .reduceRight((a, b) => q"_root_.graft.api.alg.Alg2($a, $b)")
            val nFolds = all.length
            var idx = -1
            def subsFor(folds: List[GroupFoldOcc], binder: TermName): List[(Tree, Tree)] =
              folds.map { occ =>
                idx += 1
                (occ._1,
                  groupFoldAccessor(q"${Ident(binder)}.values", idx, nFolds,
                    algsConvs(idx)._2))
              }
            val guardSubs = ug.guards.zip(uGuardFolds).map { case (gd, folds) =>
              subsFor(folds, gd.v.name)
            }
            val bodySubs = subsFor(uBodyFolds, ug.v.name)
            val fused = q"$xsU.foldGroup($kLamU, $algTree)"
            val filtered = ug.guards.zip(guardCondsI).zip(guardSubs).foldLeft(fused) {
              case (acc, ((gd, cond), subs)) =>
                q"$acc.withFilter(${lam(gd.v.name, substituteTrees(cond, subs))})"
            }
            q"$filtered.map(${lam(ug.v.name, substituteTrees(ubodyI, bodySubs))})"
          case _ =>
            c.abort(c.enclosingPosition,
              "internal: untypechecked tree no longer matches the comprehension shape")
        }

      // single-generator comprehension with a nested head and/or
      // quantified (EXISTS) guards: localize the yield's literal-ctor
      // comprehension, derive semi/anti joins for exists guards, abort on
      // any other captured distributed bag — same rules as the
      // multi-generator branch, without equi joins to derive
      case Some((gens, tbody)) if gens.length == 1 && isDataBag(gens.head.bag) &&
          (tbody.exists(isLocalBagCtor) || distributedRefInHead(tbody).isDefined ||
            gens.head.guards.exists(g => distributedValueRef(g.cond).isDefined ||
              g.cond.exists(isLocalBagCtor))) =>
        val singleFolds = collectFoldCalls(tbody,
          foldPlanAt(levelSyms(gens.head), tbody))
        for (r <- distributedRefOutside(tbody,
            singleFolds.collect { case (t, Some(_)) => t }))
          abortBagHead(r)
        val singlePlans = gens.head.guards.map(g =>
          semiPlanOf(levelSyms(gens.head) ++ guardSyms(g), g.cond))
        val singleGF = gens.head.guards.zip(singlePlans).map {
          case (_, Some(_)) => None
          case (g, None) =>
            guardFoldsOf(levelSyms(gens.head) ++ guardSyms(g), g.cond)
        }
        // ctor-comprehending guards localize; real distributed refs abort
        // (the multi-generator branch's r14 rule, single-generator twin)
        val singleLocal: List[Option[Set[TermName]]] =
          gens.head.guards.zip(singlePlans).zip(singleGF).map {
            case ((g, None), None)
                if g.cond.exists(isLocalBagCtor) &&
                  distributedValueRef(g.cond).isEmpty =>
              Some(ctorNamesIn(g.cond))
            case _ => None
          }
        for (((g, p), gf) <- gens.head.guards.zip(singlePlans).zip(singleGF)
             if p.isEmpty && gf.isEmpty;
             r <- distributedValueRef(g.cond))
          abortBagGuard(r)
        val singleHasCtor = tbody.exists(isLocalBagCtor)
        val singleCtorNames = ctorNamesIn(tbody)
        flatten(c.untypecheck(expr)) match {
          case Some((List(g0), ubody)) =>
            // single-generator twin of the multi-gen guard localization:
            // same FAIL-CLOSED backstop on positional mismatch
            val g =
              if (singleLocal.forall(_.isEmpty)) g0
              else if (singleLocal.length != g0.guards.length)
                c.abort(c.enclosingPosition,
                  "onSpark: a guard comprehends over a literal DataBag(seq) " +
                  "constructor, but the guard positions changed after " +
                  "untypecheck so the localization cannot be applied — " +
                  "hoist the inner bag into a driver val or fold outside " +
                  "the comprehension")
              else g0.copy(guards = g0.guards.zip(singleLocal).map {
                case (gd, Some(names)) => gd.copy(cond = localizeHead(gd.cond, names))
                case (gd, None) => gd
              })
            val first = g.guards.zip(singlePlans).zip(singleGF).foldLeft(g.bag) {
              case (acc, ((gd, Some(plan)), _)) =>
                lowerSemi(acc, gd, plan, o => binderLam(gd.v.name, gd.pat, o))
              case (acc, ((gd, None), Some(gf))) =>
                lowerGuardFolds(acc, gd, gf, List(Binder(gd.v.name, gd.pat)))
              case (acc, ((gd, None), None)) =>
                q"$acc.withFilter(${binderLam(gd.v.name, gd.pat, gd.cond)})"
            }
            val ufolds1 = collectFoldCallsReplay(ubody, singleFolds.map(_._2.isDefined))
            if (ufolds1.length != singleFolds.length)
              c.abort(c.enclosingPosition,
                "internal: head folds changed after untypecheck")
            val derivedF1 = ufolds1.zip(singleFolds.map(_._2))
              .collect { case (t, Some(p)) => (t, p) }
            val foldNames1 = derivedF1.map(_ => TermName(c.freshName("fold$")))
            val binders1 = Binder(g.v.name, g.pat) :: foldNames1.map(Binder(_, None))
            val withFolds1 = lowerFoldChain(first, derivedF1,
              j => o => bound(binders1.take(1 + j), 1 + j, o))
            val substituted1 = substituteAll(ubody, derivedF1.map(_._1).zip(foldNames1))
            val body1 =
              if (singleHasCtor) localizeHead(substituted1, singleCtorNames)
              else substituted1
            if (derivedF1.isEmpty)
              q"$withFolds1.map(${binderLam(g.v.name, g.pat, body1)})"
            else
              q"$withFolds1.map(${bound(binders1, binders1.length, body1)})"
          case _ =>
            c.abort(c.enclosingPosition,
              "internal: untypechecked tree no longer matches the comprehension shape")
        }

      // a DataBag flatMap whose inner bag is distributed but whose shape we
      // cannot combine: error NOW, not per-element at runtime
      case _ =>
        expr match {
          // method-spelling MatchFlatMap1 (ref Combination.scala:188-209):
          // `xs.flatMap(x => DataBag(seq(x)))` — the inner ctor is provably
          // a driver-shaped local Seq per element, so this lowers to the
          // IterableOnce flatMap overload exactly like the comprehension
          // spelling (`y <- DataBag(f(x))`); the receiver re-expands
          case Call1(xs, TermName("flatMap"), GenLam(_, _, inner))
              if isDataBag(xs) && ctorChainTyped(inner) =>
            c.untypecheck(expr) match {
              case Call1(uxs, TermName("flatMap"), GenLam(uv, upat, uinner)) =>
                val arg = ctorChainArg(uinner).getOrElse(
                  c.abort(c.enclosingPosition,
                    "internal: flatMap ctor shape changed after untypecheck"))
                q"_root_.graft.api.comprehensions.onSpark($uxs).flatMap(${binderLam(uv.name, upat, arg)})"
              case _ =>
                c.abort(c.enclosingPosition,
                  "internal: flatMap ctor shape changed after untypecheck")
            }
          case Call1(xs, TermName("flatMap"), GenLam(_, _, inner))
              if isDataBag(xs) && isDataBag(inner) =>
            c.abort(c.enclosingPosition,
              "onSpark could not derive joins for this comprehension shape; " +
              "use explicit equiJoin/cross or restructure the generators")
          case _ => deepRewrite(expr)
        }
    }
  }

  /** Is `s` a mutable-state read: a local `var`, or a class-field `var`'s
    * getter (a getter whose symbol has a paired setter). */
  private def isMutableRead(s: Symbol): Boolean =
    s != null && s != NoSymbol && s.isTerm && {
      val t = s.asTerm
      t.isVar || (t.isGetter && t.setter != NoSymbol)
    }

  /** Mutable-variable symbols referenced in `t` but not DEFINED in `t` —
    * the deferred-execution capture hazard (typed-tree walk). Matches both
    * local `var` reads (bare Ident) and member-`var` getter calls spelled
    * as a bare Ident; member reads spelled `this.x`/`obj.x` surface as
    * Select and are caught by [[memberVarSelects]] instead. */
  private def varCaptureSyms(t: Tree): List[Symbol] = {
    val defined = t.collect {
      case vd: ValDef if vd.mods.hasFlag(Flag.MUTABLE) && vd.symbol != null =>
        vd.symbol
    }.toSet
    t.collect {
      case i: Ident if isMutableRead(i.symbol) && !defined(i.symbol) =>
        i.symbol
    }.distinct
  }

  /** Mutable CLASS FIELDS read through a STABLE qualifier (`this.x`,
    * `Outer.this.x`, `SomeObject.x`) in `t` — these cannot be
    * name-substituted by the snapshot rewrite (the untyped occurrence is a
    * Select, not a free Ident), so the caller must abort with guidance
    * rather than let the deferred read float. Selects rooted at an Ident
    * (a generator binder's own var field, `x.field`) are per-element reads
    * of row data, not captures — excluded. With `insideLambdaOnly` the
    * scan flags only reads under a Function node: a BAG expression's
    * top-level member read evaluates eagerly at chain-build time (no
    * deferred-read hazard — `for (x <- this.bagVar) ...` is fine), while
    * any read inside a lambda (a groupBy key, a map stage) defers. */
  private def memberVarSelects(t: Tree,
      insideLambdaOnly: Boolean = false): List[Symbol] = {
    @annotation.tailrec
    def stableRoot(q: Tree): Boolean = q match {
      case _: This | _: Super => true
      case i: Ident =>
        i.symbol != null && i.symbol != NoSymbol && i.symbol.isModule
      case Select(inner, _) => stableRoot(inner)
      case _ => false
    }
    // a WRITE is the same trap as a read (worse: executor-side mutation
    // of driver state that never propagates back): the typer spells
    // `this.x = v` as a SETTER application and `obj.f += 1` as
    // `obj.f_$eq(obj.f + 1)`; raw field Assigns (constructor-style direct
    // access) are matched too
    def isMutableWrite(s: Symbol): Boolean =
      s != null && s != NoSymbol && s.isTerm && s.asTerm.isSetter
    val out = scala.collection.mutable.ListBuffer.empty[Symbol]
    def scan(x: Tree, inLambda: Boolean): Unit = x match {
      case _: Function =>
        x.children.foreach(scan(_, inLambda = true))
      case sel @ Select(q, _)
          if (isMutableRead(sel.symbol) || isMutableWrite(sel.symbol)) &&
            stableRoot(q) && (inLambda || !insideLambdaOnly) =>
        out += sel.symbol
        x.children.foreach(scan(_, inLambda))
      case Assign(sel @ Select(q, _), rhs)
          if sel.symbol != null && sel.symbol != NoSymbol &&
            sel.symbol.isTerm && sel.symbol.asTerm.isVar && stableRoot(q) &&
            (inLambda || !insideLambdaOnly) =>
        out += sel.symbol
        scan(rhs, inLambda)
      case _ => x.children.foreach(scan(_, inLambda))
    }
    scan(t, inLambda = false)
    out.toList.distinct
  }

  /** The inner tree of a flatMap lambda is a (possibly block-wrapped)
    * literal `DataBag(seq)` constructor — TYPED-side decision twin of
    * [[ctorChainArg]]. */
  private def ctorChainTyped(t: Tree): Boolean = t match {
    case _ if isLocalBagCtor(t) => true
    case Block(_, e) => ctorChainTyped(e)
    case _ => false
  }

  /** Shape-only (untyped-side) extraction of the ctor's Seq argument,
    * preserving any wrapping block's statements. */
  private def ctorChainArg(t: Tree): Option[Tree] = t match {
    case Call1(_, TermName("apply"), a) => Some(a)
    case Block(stats, e) => ctorChainArg(e).map(a => Block(stats, a))
    case _ => None
  }

  /** Default-case deep pass. The reference normalizes WHOLE programs to a
    * fixpoint (Normalize.scala:44-52 rewrites every subtree); this macro
    * re-expands instead: when the quoted expression is not itself a
    * comprehension chain (a block of vals over several comprehensions, a
    * tuple of them, a loop assigning one to a var, ...), each maximal
    * derivable chain found in a DRIVER-side position is wrapped in a
    * nested `onSpark` call and the typer re-expands it there. Function and
    * local-def BODIES are never entered — a chain inside a lambda may
    * execute on executors, where the rewrite's joins would crash; those
    * shapes keep the existing per-case analysis (head/guard aborts).
    * Without this pass a block spelling silently passed through to
    * `DataBag.flatMap`'s distributed-inner overload and threw at RUNTIME —
    * deriving here turns those programs into the same join plans as their
    * chain-only spellings. */
  private def deepRewrite(expr: Tree): Tree = {
    // a chain at the ROOT was already analyzed by the per-case matches and
    // deliberately passed through (plain map/filter shapes run correctly
    // as-is) — do not re-wrap it or any node on its call spine (Call1
    // strips implicit-arg Apply layers, so a child one level under the
    // root can spuriously re-match the same chain)
    if (isChainCandidate(expr)) return expr
    var hits = 0
    val tr = new Transformer {
      override def transform(t: Tree): Tree = t match {
        case _: Function | _: DefDef | _: ClassDef | _: ModuleDef => t
        case _ if isChainCandidate(t) =>
          // expand in place (single untypecheck inside expandTop); an
          // unchanged result means the chain is a plain shape that runs
          // correctly as-is — keep it typed and atomic either way
          val r = expandTop(t)
          if (r eq t) t else { hits += 1; r }
        case _ => super.transform(t)
      }
    }
    val out = tr.transform(expr)
    // untypecheck the WHOLE result once (the battle-tested main-path
    // idiom): replaced subtrees are untyped while their parents kept
    // types, and the typer skips typed parents — it must re-descend
    // through the full tree to adapt the new parts
    if (hits == 0) expr else c.untypecheck(out)
  }

  /** A subtree worth re-expanding: a comprehension chain rooted at a
    * distributed bag, or a direct flatMap whose inner is a bag (derivable
    * ctor or abort-worthy distributed — both belong to the re-expanded
    * macro's per-case analysis). */
  private def isChainCandidate(t: Tree): Boolean = flatten(t) match {
    case Some((gens, _)) => gens.nonEmpty && isDataBag(gens.head.bag)
    case None => t match {
      case Call1(xs, TermName("flatMap"), GenLam(_, _, inner))
          if isDataBag(xs) && (isDataBag(inner) || ctorChainTyped(inner)) => true
      case _ => false
    }
  }
}
