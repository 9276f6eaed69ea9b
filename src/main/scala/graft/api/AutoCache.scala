package graft.api

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Automatic cache insertion for multiply-consumed bags — the runtime
  * equivalent of the reference compiler's cache-call insertion
  * (emma-language compiler/opt/Caching.scala:74-139: persist any bag
  * referenced more than once or from a loop, unpersist on scope exit).
  *
  * While a scope is active (thread-local), every [[DataBag]] operator
  * reports the bag(s) it consumes. The SECOND consumption of the same
  * underlying Dataset persists it — lazily, so nothing is materialized
  * until the next action, by which point the multiply-used node is marked
  * and every consumer shares ONE scan. Scope exit unpersists exactly what
  * the scope persisted.
  *
  * The diamond shape needs no user changes:
  * {{{
  * AutoCache.scope { _ =>
  *   val xs = DataBag.readParquet[X](path)
  *   val hot = xs.where(cond)   // 1st consumption of xs
  *   val big = xs.map(f)        // 2nd → xs persisted (lazy)
  *   (hot.size, big.size)       // one parquet scan total
  * }
  * }}}
  *
  * Repeated ACTIONS on one bag are eager, so their multiplicity is only
  * visible ahead of time if deferred:
  * {{{
  * AutoCache.scope { s =>
  *   val xs = DataBag.readParquet[X](path)
  *   val sum = s.defer(xs)(_.sum)   // 1st consumption, deferred
  *   val n   = s.defer(xs)(_.size)  // 2nd → persist; both run at scope end
  *   (sum, n)                       // one scan; read with .value
  * }.value
  * }}}
  *
  * Outside a scope every hook is a no-op (one thread-local read), so the
  * plain API keeps its explicit-[[DataBag.cache]] semantics.
  *
  * Cost note: INSIDE a scope, named folds (`sum`/`size`/`min`/`max`/
  * `fold`) take the object-fold batch path — fusable into one pass and
  * memoized, but deserializing — instead of the columnar fast paths
  * (`count()`, Catalyst agg). That is the right trade whenever a bag is
  * folded more than once (the scope's premise); a single wide-row count
  * with no sibling folds is cheaper OUTSIDE the scope.
  */
object AutoCache {

  /** An action deferred to scope exit (after cache decisions are final). */
  final class Deferred[B] private[AutoCache] (thunk: () => B) {
    private[AutoCache] def force(): Unit = { val _ = value }
    lazy val value: B = thunk()
  }

  /** A fold queued for fusion: holds its bag + algebra until the batch
    * runs, then its slot of the foldAll result. */
  private final class PendingFold[A, B](val bag: DataBag[A], val alg: graft.api.alg.Alg[A, B]) {
    private var result: Option[Any] = None
    private[AutoCache] def set(r: Any): Unit = result = Some(r)
    private[AutoCache] def get: B = result.getOrElse(
      throw new IllegalStateException("deferred fold read before batch ran")
    ).asInstanceOf[B]
  }

  final class Scope private[AutoCache] () {
    private val seen = new java.util.IdentityHashMap[Dataset[_], Integer]
    private val persisted = new java.util.ArrayList[Dataset[_]]
    private val deferred = new java.util.ArrayList[Deferred[_]]
    private val pendingFolds =
      new java.util.IdentityHashMap[Dataset[_], java.util.ArrayList[PendingFold[_, _]]]
    // fold results memoized per (dataset identity, algebra value) — the
    // PLAIN-spelling half of fold-forest fusion (see [[namedFold]])
    private val foldMemo =
      new java.util.IdentityHashMap[Dataset[_], java.util.HashMap[Any, Any]]

    private[api] def note(ds: Dataset[_]): Unit = {
      val n = seen.merge(ds, 1, (a, b) => a + b)
      if (n == 2 && ds.storageLevel == StorageLevel.NONE) {
        ds.persist(StorageLevel.MEMORY_AND_DISK)
        persisted.add(ds)
      }
    }

    /** Defer an action so it runs at scope exit, when every bag's
      * consumption count (hence cache decision) is already known. */
    def defer[A, B](bag: DataBag[A])(f: DataBag[A] => B): Deferred[B] = {
      note(bag.ds)
      val d = new Deferred(() => f(bag))
      deferred.add(d)
      d
    }

    /** Defer a FOLD so that all deferred folds of the SAME bag execute as
      * ONE [[DataBag.foldAll]] job — the reference's fold-forest fusion
      * (compiler/opt/FoldForestFusion.scala:293-327) as a runtime rule:
      * the compiler fuses N independent folds of one bag into a single
      * banana; here the scope accumulates them and fuses at first read
      * (or scope exit, whichever comes first). Results are bit-identical
      * to running each fold alone — AlgAll evaluates every algebra on the
      * same element stream in registration order. */
    def deferFold[A, B](bag: DataBag[A])(alg: graft.api.alg.Alg[A, B]): Deferred[B] = {
      note(bag.ds)
      val pf = new PendingFold(bag, alg)
      pendingFolds
        .computeIfAbsent(bag.ds, _ => new java.util.ArrayList[PendingFold[_, _]])
        .add(pf)
      val d = new Deferred(() => { runPendingFolds(bag.ds); pf.get })
      deferred.add(d)
      d
    }

    private def runPendingFolds(ds: Dataset[_]): Unit = {
      val list = pendingFolds.remove(ds)
      if (list != null && !list.isEmpty) {
        val pfs = new Array[PendingFold[_, _]](list.size())
        list.toArray(pfs)
        val bag = pfs(0).bag.asInstanceOf[DataBag[Any]]
        val algs = pfs.map(_.alg.asInstanceOf[graft.api.alg.Alg[Any, _]]).toSeq
        val results = bag.foldAll(algs: _*)
        var i = 0
        val memo = foldMemo.computeIfAbsent(ds, _ => new java.util.HashMap[Any, Any])
        while (i < pfs.length) {
          pfs(i).set(results(i))
          // every batch slot also memoizes by algebra VALUE: a later plain
          // fold of the same algebra returns without a job
          if (!memo.containsKey(pfs(i).alg)) memo.put(pfs(i).alg, results(i))
          i += 1
        }
      }
    }

    /** The PLAIN-spelling half of fold-forest fusion (ref
      * FoldForestFusion.scala:293-327; the `deferFold` spelling above is
      * the opt-in half): a plain named fold (`xs.sum`, `xs.size`,
      * `xs.min`, any `xs.fold(alg)`) inside a scope
      *
      *  1. returns memoized — ZERO jobs — when this algebra (by value
      *     equality) already ran for this dataset in this scope;
      *  2. otherwise joins the pending batch (any `deferFold`s queued so
      *     far plus cheap speculative COMPANIONS the call site supplies —
      *     `Size` always, `Max` alongside `min`, ...) and runs the whole
      *     batch as ONE `foldAll` job, memoizing every slot.
      *
      * So the reference-natural spelling `val s = xs.sum; val n = xs.size`
      * costs one job, not two, with bit-identical results (AlgAll runs
      * each algebra over the same element stream). Eagerness is
      * preserved — each call still returns its value immediately; only
      * ALREADY-KNOWN work is elided. */
    private[api] def namedFold[A, B](bag: DataBag[A], alg: graft.api.alg.Alg[A, B],
        companions: Seq[graft.api.alg.Alg[A, _]]): B = {
      val memo = foldMemo.computeIfAbsent(bag.ds, _ => new java.util.HashMap[Any, Any])
      if (memo.containsKey(alg)) return memo.get(alg).asInstanceOf[B]
      val list = pendingFolds
        .computeIfAbsent(bag.ds, _ => new java.util.ArrayList[PendingFold[_, _]])
      val queued = new java.util.HashSet[Any]
      list.forEach(pf => { val _ = queued.add(pf.alg) })
      (alg +: companions).foreach { a =>
        if (!queued.contains(a) && !memo.containsKey(a)) {
          val _ = queued.add(a)
          list.add(new PendingFold(bag, a))
        }
      }
      // COLLECT mode (see [[deferNamed]]): the algebra is queued, nothing
      // runs — the caller discards this junk value and re-reads after the
      // whole gang is queued, so all folds of one bag fuse into ONE job
      if (collecting.get()) return alg.zero.asInstanceOf[B]
      runPendingFolds(bag.ds)
      memo.get(alg).asInstanceOf[B]
    }

    private[AutoCache] def flush(): Unit =
      deferred.forEach(_.force())

    private[AutoCache] def release(): Unit =
      persisted.forEach(_.unpersist(blocking = false))
  }

  private val active = new ThreadLocal[Scope]

  private val collecting = new ThreadLocal[java.lang.Boolean] {
    override def initialValue: java.lang.Boolean = java.lang.Boolean.FALSE
  }

  /** Hook for the macro's HOISTED generator-independent folds (only
    * fold-ROUTED spellings — sum/size/min/max/product/top/bottom/reduce/
    * minBy/maxBy/fold — are emitted through here). Inside a scope the thunk
    * first runs once in COLLECT mode: [[Scope.namedFold]] queues each
    * algebra into the bag's pending batch and returns a discarded zero, so
    * N hoisted folds of one bag land in ONE pending batch before anything
    * executes; the returned accessor re-runs the thunk for real — the first
    * read executes the fused `foldAll`, the rest hit the memo (the
    * reference's FoldForestFusion applied to the uncorrelated-scalar
    * hoist). A collect-mode throw (e.g. `min`'s `.get` over the zero) is
    * swallowed — the queue insert already happened and the read re-raises
    * anything real. Outside a scope the thunk runs once, eagerly,
    * exactly like the plain `val` it replaces.
    *
    * Fusion boundary: the batch keys by DATASET IDENTITY, so folds of a
    * STABLE bag val (the common hoist shape) fuse; a fold over a chain
    * rebuilt inside the thunk (`ys.map(f).sum`) queues under the collect
    * run's Dataset and the read's fresh Dataset misses it — such folds run
    * correct but unfused (the orphaned queue entries never execute on
    * their own; they ride along only if that same Dataset is folded). */
  def deferNamed[B](thunk: () => B): () => B = {
    val s = active.get()
    if (s == null) { val r = thunk(); () => r }
    else {
      // save/restore (not set-false): a thunk whose rhs contains a NESTED
      // expansion with its own deferNamed must not end the outer collect
      val prev = collecting.get()
      collecting.set(java.lang.Boolean.TRUE)
      try { val _ = thunk() }
      catch { case scala.util.control.NonFatal(_) => () }
      finally collecting.set(prev)
      () => thunk()
    }
  }

  /** Establish a scope only when none is active — the hook behind the
    * macro's self-established fold-fusion scope (the reference pipeline
    * runs fold-fusion + auto-cache UNCONDITIONALLY,
    * emma-spark SparkCompiler.scala:36-39 + compiler/opt/Caching.scala:
    * 74-139, so a bare quoted stats pipeline must fuse without a manual
    * `AutoCache.scope` wrapper). Inside an existing scope this is a pure
    * pass-through: an explicit user scope (or an enclosing expansion's
    * self-established one) keeps ownership, so sibling pipelines fuse
    * ACROSS expansions and caches drop at the OUTER scope's exit, never
    * early. */
  def scopeIfInactive[T](body: => T): T =
    if (active.get() != null) body else scope(_ => body)

  /** Run `body` with consumption tracking; deferred actions execute before
    * the scope's caches are dropped. Nested scopes stack (inner scope wins
    * while active). */
  def scope[T](body: Scope => T): T = {
    val s = new Scope
    val prev = active.get()
    active.set(s)
    try {
      val r = body(s)
      s.flush()
      r
    } finally {
      active.set(prev)
      s.release()
    }
  }

  private[api] def touched(b: DataBag[_]): Unit = {
    val s = active.get()
    if (s != null) s.note(b.ds)
  }

  /** Route a named fold through the active scope's batch/memo machinery;
    * outside any scope, run it directly (zero-overhead no-op). */
  private[api] def foldThrough[A, B](bag: DataBag[A], alg: graft.api.alg.Alg[A, B],
      companions: Seq[graft.api.alg.Alg[A, _]])(run: () => B): B = {
    val s = active.get()
    if (s == null) run() else s.namedFold(bag, alg, companions)
  }

  private[api] def isActive: Boolean = active.get() != null
}
