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
        while (i < pfs.length) { pfs(i).set(results(i)); i += 1 }
      }
    }

    private[AutoCache] def flush(): Unit =
      deferred.forEach(_.force())

    private[AutoCache] def release(): Unit =
      persisted.forEach(_.unpersist(blocking = false))
  }

  private val active = new ThreadLocal[Scope]

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
}
