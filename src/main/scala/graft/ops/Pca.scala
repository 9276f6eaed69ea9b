package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed PCA / whitening for the embedding pipeline — the standard
  * pre-ANN dimensionality-reduction step of a large-scale curation stack
  * (project 64-dim vectors to the top-k principal components before
  * IVF/LSH so cells are balanced and distances concentrate).
  *
  * Scale shape: ONE map-side-combinable aggregation produces the d×d Gram
  * matrix (d² accumulator cells, independent of row count — at 100 TB the
  * reduce tree moves a few KB per partition and nothing else); the d×d
  * eigenproblem is solved on the driver (cyclic Jacobi, O(d³) ≈ instant for
  * embedding-sized d); the projection matrix broadcasts back and the
  * projection itself is a narrow per-row map.
  *
  * Determinism: inputs are micro-rounded to integers ONCE per value, and
  * the Gram/mean sums are exact integer sums (order-independent under any
  * partitioning — the q138/q145 portability pattern). The covariance fed to
  * Jacobi is a fixed arithmetic expression over those exact integers, and
  * Jacobi itself is a deterministic driver-side computation, so the whole
  * decomposition is bit-stable across runs and cluster layouts. Long-range
  * bound: |x| ≤ ~9e5 micros ⇒ n·Σx² fits signed 64-bit up to ~10⁷ rows per
  * the gate's unit scale; lower `unit` (e.g. 1e3) for 10¹²-row corpora, or
  * sample the Gram (PCA needs only a representative second moment).
  */
object Pca {

  /** Exact integer second-moment accumulator: n, Σx (d longs), Σxᵢxⱼ upper
    * triangle (d(d+1)/2 longs) over micro-rounded values. */
  final case class Moments(var n: Long, sum: Array[Long], prod: Array[Long]) {
    def merge(o: Moments): Moments = {
      n += o.n
      var i = 0
      while (i < sum.length) { sum(i) = Math.addExact(sum(i), o.sum(i)); i += 1 }
      i = 0
      while (i < prod.length) { prod(i) = Math.addExact(prod(i), o.prod(i)); i += 1 }
      this
    }
  }

  private def micro(x: Double, unit: Double): Long =
    math.floor(x * unit + 0.5).toLong

  /** One pass: exact integer moments of the micro-rounded vectors.
    * treeAggregate ⇒ partials combine map-side and up a tree — the driver
    * receives O(d²) longs regardless of corpus size. Accepts float or
    * double vectors (cast is exact). All integer accumulation is
    * overflow-CHECKED (`Math.addExact`/`multiplyExact`): a corpus that
    * exceeds the documented 64-bit budget fails loudly instead of wrapping
    * into garbage eigenvectors. */
  def moments(emb: DataFrame, vecCol: String = "embedding",
      unit: Double = 1e6): Moments = {
    val sized = emb.select(size(col(vecCol))).limit(1).collect()
    require(sized.nonEmpty, s"Pca.moments: empty input, no vectors in '$vecCol'")
    val d = sized(0).getInt(0)
    val vecs = emb.select(col(vecCol).cast("array<double>")).rdd
      .map(_.getSeq[Double](0).toArray)
    val zero = Moments(0L, new Array[Long](d), new Array[Long](d * (d + 1) / 2))
    vecs.treeAggregate(zero)(
      seqOp = { (m, v) =>
        require(v.length == d, s"ragged vector: ${v.length} != $d")
        val mv = new Array[Long](d)
        var i = 0
        while (i < d) { mv(i) = micro(v(i), unit); i += 1 }
        m.n += 1
        i = 0
        var t = 0
        while (i < d) {
          m.sum(i) = Math.addExact(m.sum(i), mv(i))
          var j = i
          while (j < d) {
            m.prod(t) = Math.addExact(m.prod(t), Math.multiplyExact(mv(i), mv(j)))
            j += 1; t += 1
          }
          i += 1
        }
        m
      },
      combOp = _ merge _)
  }

  /** Population covariance (micro²-scaled doubles) from exact moments:
    * C·n² = n·Σxy − Σx·Σy with the numerator in BIG-INTEGER arithmetic —
    * exact even when n·Σxy exceeds 2⁵³ — rounded to double exactly once. */
  def covariance(m: Moments): Array[Array[Double]] = {
    val d = m.sum.length
    val c = Array.ofDim[Double](d, d)
    var i = 0
    var t = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val num = BigInt(m.prod(t)) * m.n - BigInt(m.sum(i)) * m.sum(j)
        val v = num.toDouble / (m.n.toDouble * m.n)
        c(i)(j) = v; c(j)(i) = v
        j += 1; t += 1
      }
      i += 1
    }
    c
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix. Deterministic:
    * fixed sweep order, fixed rotation formulas, convergence when the
    * off-diagonal Frobenius mass drops below `tol` relative to the diagonal.
    * Returns (eigenvalues, eigenvectors as rows), sorted by eigenvalue
    * descending (tie-break: original index), each vector sign-fixed so its
    * largest-|component| entry is positive. */
  def jacobiEigen(a0: Array[Array[Double]], tol: Double = 1e-12,
      maxSweeps: Int = 64): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def offMass(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) { var j = i + 1; while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      s
    }
    def diagMass(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) { s += a(i)(i) * a(i)(i); i += 1 }
      math.max(s, 1e-300)
    }
    var sweep = 0
    while (sweep < maxSweeps && offMass() > tol * diagMass()) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case s0 => s0 / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < d) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    val evals = order.map(i => a(i)(i)).toArray
    val evecs = order.map { i =>
      val col = Array.tabulate(d)(k => v(k)(i))
      var mi = 0
      var k = 1
      while (k < d) { if (math.abs(col(k)) > math.abs(col(mi))) mi = k; k += 1 }
      if (col(mi) < 0) col.map(-_) else col
    }.toArray
    (evals, evecs)
  }

  /** The fitted model: means in micro units, eigenvalues (micro²-scaled
    * variances, descending), principal components as rows. */
  final case class Model(n: Long, d: Int, unit: Double,
      meanMicros: Array[Double], eigenvalues: Array[Double],
      components: Array[Array[Double]])

  def fit(emb: DataFrame, vecCol: String = "embedding",
      unit: Double = 1e6): Model = {
    val m = moments(emb, vecCol, unit)
    val (evals, evecs) = jacobiEigen(covariance(m))
    val means = m.sum.map(_.toDouble / m.n)
    Model(m.n, m.sum.length, unit, means, evals, evecs)
  }

  /** Project to the top-k components: y = Wᵀ(x − mean), a narrow per-row map
    * under a broadcast of W (k·d doubles). `whiten` divides each component
    * by √eigenvalue (unit-variance output — the pre-quantization form).
    * Output: (id columns…, projection array<double>). */
  def project(emb: DataFrame, model: Model, k: Int,
      vecCol: String = "embedding", whiten: Boolean = false): DataFrame = {
    require(k <= model.d, s"k=$k > d=${model.d}")
    val spark = emb.sparkSession
    val bc = spark.sparkContext.broadcast(
      (model.meanMicros, model.components.take(k),
        model.eigenvalues.take(k), model.unit, whiten))
    val others = emb.columns.filter(_ != vecCol)
    val schema = org.apache.spark.sql.types.StructType(
      emb.schema.fields.filter(_.name != vecCol) :+
        org.apache.spark.sql.types.StructField("projection",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, containsNull = false)))
    val reordered = emb.select((others.map(col) :+ col(vecCol).cast("array<double>")): _*)
    spark.createDataFrame(reordered.rdd.mapPartitions { it =>
      val (mean, w, ev, unit, wh) = bc.value
      val kk = w.length
      it.map { r =>
        val vec = r.getSeq[Double](r.length - 1)
        val x = new Array[Double](mean.length)
        var i = 0
        while (i < x.length) {
          x(i) = math.floor(vec(i) * unit + 0.5) - mean(i)
          i += 1
        }
        val y = new Array[Double](kk)
        var c = 0
        while (c < kk) {
          var s = 0.0
          var j = 0
          val row = w(c)
          while (j < x.length) { s += row(j) * x(j); j += 1 }
          y(c) = if (wh) s / math.sqrt(math.max(ev(c), 1e-300)) else s
          c += 1
        }
        Row.fromSeq(r.toSeq.dropRight(1) :+ (y.toSeq: Seq[Double]))
      }
    }, schema)
  }
}
