package graft.api

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.storage.StorageLevel

/** Keyed mutable state for iterative algorithms.
  *
  * Semantics follow the reference's `MutableBag[K, V]`
  * (emma-language api/MutableBag.scala:23-51): `update(ms)(f)` applies `f` to
  * every key present in `ms` (right-outer on the update bag), where `f`
  * receives the key, the current value (if any), and the update message, and
  * returns `Some(newValue)` to upsert or `None` to leave the state unchanged;
  * it returns the delta. `bag()` snapshots the state; `copy()` clones it.
  *
  * The reference backs this with AMPLab IndexedRDD point-updates
  * (SparkMutableBag.scala:39-50). IndexedRDD is unmaintained; this
  * implementation keeps state as a `Dataset[(K, V)]` and realizes `update` as
  * a shuffle-free-when-co-partitioned cogroup, with eager localCheckpoint to
  * cut lineage across fixpoint iterations (the role of the reference's
  * auto-cache rule, Caching.scala:74-139).
  */
final class MutableBag[K, V] private (
    private var state: Dataset[(K, V)],
    encK: Encoder[K],
    encV: Encoder[V]) extends Serializable {

  private implicit val kvEnc: Encoder[(K, V)] = Encoders.tuple(encK, encV)

  def update[M](ms: DataBag[Group[K, M]])(f: (K, Option[V], M) => Option[V])(
      implicit encM: Encoder[M]): DataBag[(K, V)] = {
    val kmEnc: Encoder[(K, M)] = Encoders.tuple(encK, encM)
    val updates: Dataset[(K, M)] = ms.ds.map(g => (g.key, g.values))(kmEnc)

    val delta: Dataset[(K, V)] = state
      .groupByKey(_._1)(encK)
      .cogroup(updates.groupByKey(_._1)(encK)) { (k, vs, msIt) =>
        val vOpt = vs.map(_._2).nextOption()
        msIt.flatMap { case (_, m) => f(k, vOpt, m).map(k -> _) }
      }

    val deltaCached = delta.persist(StorageLevel.MEMORY_AND_DISK)

    // new state = old state overridden by delta (delta wins per key)
    val newState: Dataset[(K, V)] = state
      .groupByKey(_._1)(encK)
      .cogroup(deltaCached.groupByKey(_._1)(encK)) { (k, olds, news) =>
        val n = news.toSeq
        if (n.nonEmpty) n.iterator else olds
      }

    val old = state
    state = newState.localCheckpoint(true)
    // NOTE: old's checkpoint blocks are NOT freed eagerly — copy() hands out
    // snapshots sharing the state Dataset, and a truncated-lineage snapshot
    // cannot be recomputed once its blocks are gone. The ContextCleaner frees
    // them when the last reference is collected.
    old.unpersist()
    DataBag.from(deltaCached)
  }

  /** Snapshot of the current state. */
  def bag(): DataBag[(K, V)] = DataBag.from(state)

  /** Clone with value semantics across loop iterations. */
  def copy(): MutableBag[K, V] = new MutableBag(state, encK, encV)
}

object MutableBag {
  def apply[K, V](init: DataBag[(K, V)])(
      implicit encK: Encoder[K], encV: Encoder[V]): MutableBag[K, V] =
    new MutableBag(init.ds.localCheckpoint(true), encK, encV)
}
