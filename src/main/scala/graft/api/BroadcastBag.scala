package graft.api

/** The reference's broadcast-variable lowering for driver bags referenced
  * inside engine lambdas — `SparkBackend` inserts `broadcast`/`bag` pairs
  * around closure-captured bags (emma-spark compiler/backend/
  * SparkBackend.scala:66-117; SparkNtv.broadcast/bag, SparkNtv.scala:
  * 88-97), and the generic backend falls back to `.collect()`
  * materialization (GenericSpecialization.scala:83-139). Graft keeps the
  * blanket capture ABORT for the general case (a silent collect of an
  * unbounded bag is a scale cliff) and derives this form only when the
  * user opted in by writing `.broadcasted` on the captured bag — the
  * same smallness assertion Spark's own `broadcast()` join hint encodes.
  *
  * The macro rewrites a guard anchor `small.broadcasted.exists(p)` /
  * `.forall(p)` that the semi-join and fold-comparison derivations
  * cannot claim (e.g. a RANGE membership `k > lo && k < hi`) into a
  * hoisted `val bc = BroadcastBag(small)` plus `bc.exists(p)` inside the
  * filter closure: ONE driver collect + ONE torrent broadcast, then
  * every executor evaluates the predicate against its local copy —
  * instead of the former compile-time abort.
  *
  * Scale: the big side streams unchanged; this materializes ONLY the
  * hinted bag, bounded by [[BroadcastBag.MaxElements]] (default 10M
  * elements — far beyond sensible, but a hard stop before the driver
  * OOMs on a mis-hinted bag; tune with -Dgraft.broadcast.maxElements). */
final class BroadcastBag[A] private (
    private val bc: org.apache.spark.broadcast.Broadcast[Vector[A]])
  extends Serializable {

  def exists(p: A => Boolean): Boolean = bc.value.exists(p)
  def forall(p: A => Boolean): Boolean = bc.value.forall(p)
  def contains(x: A): Boolean = bc.value.contains(x)
  def size: Long = bc.value.size.toLong
}

object BroadcastBag {

  /** Hard stop for a mis-hinted (not-actually-small) bag. */
  val MaxElements: Int = sys.props.get("graft.broadcast.maxElements")
    .flatMap(_.toIntOption).getOrElse(10000000)

  def apply[A](xs: DataBag[A]): BroadcastBag[A] = {
    val elems = xs.collect().toVector
    if (elems.size > MaxElements)
      throw new IllegalStateException(
        s"BroadcastBag: the `.broadcasted` bag has ${elems.size} elements " +
        s"(> $MaxElements) — too large to broadcast into guard closures; " +
        "drop the hint and restructure as a join, or raise " +
        "-Dgraft.broadcast.maxElements")
    new BroadcastBag(xs.ds.sparkSession.sparkContext.broadcast(elems))
  }
}
