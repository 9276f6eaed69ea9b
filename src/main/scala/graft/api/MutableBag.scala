package graft.api

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

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

    // checkpoint (not just persist) AND drop origin stats: callers feed the
    // returned delta into the NEXT round's messages, so an un-truncated
    // delta chains plans across rounds (measured: 137→2500 MB of driver
    // heap in 13 rounds on a 40-row state), and checkpoint-carried origin
    // stats compound multiplicatively between state and delta (see
    // bridge.dropOriginStats) until round ~17 planning stalls on
    // million-bit BigInt products
    val deltaCached = checkpointed(delta)

    // new state = old state overridden by delta (delta wins per key)
    val newState: Dataset[(K, V)] = state
      .groupByKey(_._1)(encK)
      .cogroup(deltaCached.groupByKey(_._1)(encK)) { (k, olds, news) =>
        val n = news.toSeq
        if (n.nonEmpty) n.iterator else olds
      }

    val old = state
    state = checkpointed(newState)
    // NOTE: old's checkpoint blocks are NOT freed eagerly — copy() hands out
    // snapshots sharing the state Dataset, and a truncated-lineage snapshot
    // cannot be recomputed once its blocks are gone. The ContextCleaner frees
    // them when the last reference is collected.
    old.unpersist()
    DataBag.from(deltaCached)
  }

  /** [[update]] for SMALL update bags — the Spark-native stand-in for the
    * reference's IndexedRDD point updates (SparkMutableBag.scala:39-50).
    * Collects the messages to the driver, broadcasts them, and applies them
    * in ONE narrow pass over the state: zero shuffles per round (the cogroup
    * form pays two), no state movement, lineage still truncated. The pass is
    * still O(|state|) scan work — a scan-free point update needs an indexed
    * store Spark's Dataset doesn't have — but at cluster scale the shuffle,
    * not the scan, is what dominates a small-delta round.
    *
    * Same contract as [[update]]; additionally `f` must be PURE — it runs
    * once in the delta pass and once in the state pass. Only call when the
    * messages fit on the driver (the usual tail of a converging fixpoint);
    * the absent-key inserts are driver-computed and appended as a single
    * extra partition.
    */
  def updateBroadcast[M](ms: DataBag[Group[K, M]])(f: (K, Option[V], M) => Option[V])(
      implicit encM: Encoder[M]): DataBag[(K, V)] = {
    val kmEnc: Encoder[(K, M)] = Encoders.tuple(encK, encM)
    val spark = state.sparkSession
    val msgs: Map[K, Seq[M]] = ms.ds.map(g => (g.key, g.values))(kmEnc)
      .collect().toSeq.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val bc = spark.sparkContext.broadcast(msgs)

    // keys the state already holds (tiny result: ≤ |msgs| rows move)
    val present: Set[K] =
      state.filter(kv => bc.value.contains(kv._1)).map(_._1)(encK).collect().toSet
    val absentDelta: Seq[(K, V)] = (msgs.keySet -- present).toSeq
      .flatMap(k => msgs(k).flatMap(m => f(k, None, m).map(k -> _)))

    val matchedDelta: Dataset[(K, V)] = state.mapPartitions { it =>
      it.flatMap { case (k, v) =>
        bc.value.get(k).iterator.flatMap(_.flatMap(m => f(k, Some(v), m).map(k -> _)))
      }
    }
    // same lineage + stats hygiene as [[update]]
    val deltaCached = checkpointed(matchedDelta
      .union(spark.createDataset(absentDelta)(kvEnc)))

    // new state in the same narrow shape: updated keys replaced in place
    // (all Nones -> row kept, mirroring the cogroup form), inserts appended
    val newState: Dataset[(K, V)] = state.mapPartitions { it =>
      it.flatMap { case (k, v) =>
        bc.value.get(k) match {
          case Some(mlist) =>
            val news = mlist.flatMap(m => f(k, Some(v), m).map(k -> _))
            if (news.nonEmpty) news else Seq(k -> v)
          case None => Seq(k -> v)
        }
      }
    }.union(spark.createDataset(absentDelta)(kvEnc))

    val old = state
    state = checkpointed(newState)
    old.unpersist()
    // NOT bc.destroy(): deltaCached is lazy and still reads the broadcast on
    // first evaluation; the ContextCleaner reclaims it once unreferenced
    DataBag.from(deltaCached)
  }

  /** Eager localCheckpoint with the checkpoint's carried-over origin stats
    * stripped — both halves matter for fixpoint loops (see the comment in
    * [[update]] and `bridge.dropOriginStats`). */
  private def checkpointed(ds: Dataset[(K, V)]): Dataset[(K, V)] =
    org.apache.spark.sql.graft.bridge
      .dropOriginStats(ds.localCheckpoint(true)).as(kvEnc)

  /** Snapshot of the current state. */
  def bag(): DataBag[(K, V)] = DataBag.from(state)

  /** Clone with value semantics across loop iterations. */
  def copy(): MutableBag[K, V] = new MutableBag(state, encK, encV)
}

object MutableBag {
  def apply[K, V](init: DataBag[(K, V)])(
      implicit encK: Encoder[K], encV: Encoder[V]): MutableBag[K, V] =
    new MutableBag(
      org.apache.spark.sql.graft.bridge
        .dropOriginStats(init.ds.localCheckpoint(true))
        .as(Encoders.tuple(encK, encV)),
      encK, encV)
}
