package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd cosine similarity over two `array<float>` columns.
  *
  * The composed form (`aggregate(zip_with(a, b, *), ...) / (norm * norm)`)
  * walks both arrays three times and allocates an intermediate array per row;
  * this expression fuses dot product and both norms into ONE allocation-free
  * loop inside whole-stage codegen. Summation order is left-to-right like the
  * composed form, so results are bit-identical to [[graft.ops.Similarity]]'s
  * column formulation (and to the DuckDB oracle).
  *
  * This is the (b)-tier extension point of the build plan — a custom Catalyst
  * `Expression` with `doGenCode` — used where composing built-ins genuinely
  * costs (per-row allocation on a 100 TB ANN scan).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  // Reject anything but array<float> at analysis time: the ArrayData
  // accessors below read fixed 4-byte floats, so e.g. an array<double>
  // input would silently return garbage rather than fail. (Implemented via
  // checkInputDataTypes — ExpectsInputTypes.inputTypes names the
  // private[sql] AbstractDataType and can't be overridden from here.)
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double dot = 0.0, nx = 0.0, ny = 0.0;
         |for (int i = 0; i < n; i++) {
         |  double xi = (double) $a.getFloat(i);
         |  double yi = (double) $b.getFloat(i);
         |  dot += xi * yi; nx += xi * xi; ny += yi * yi;
         |}
         |${ev.value} = dot / (java.lang.Math.sqrt(nx) * java.lang.Math.sqrt(ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Native codegen'd Unicode NFC normalization — the text-canonicalization
  * step every dedup/fingerprint pipeline needs before hashing (two byte
  * sequences can render identically yet hash differently), which Spark has
  * no built-in for. A scalar JDK call (`java.text.Normalizer`) inside
  * whole-stage codegen, with an `isNormalized` short-circuit so the common
  * already-NFC row costs one check and zero allocations beyond the
  * `toString` bridge. */
case class NfcNormalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.simpleString}")
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any = {
    val s = input.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) input
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |java.lang.String s = $c.toString();
         |${ev.value} = java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)
         |  ? $c
         |  : org.apache.spark.unsafe.types.UTF8String.fromString(
         |      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Native codegen'd deflate-compressed size of a string's UTF-8 bytes at a
  * fixed level — the kernel of the gzip-compressibility quality signal
  * ([[graft.ops.TextAnalysis.compressionRatio]]). Keeping it an expression
  * (rather than an `rdd.mapPartitions` pass) keeps the whole signal inside
  * Tungsten/whole-stage codegen: no object round trip, free column pruning
  * and pushdown around it. The zlib context is NATIVE state, so each
  * executor thread lazily owns ONE `Deflater` + buffer for its lifetime
  * (thread-local, reset per value) — bounded by the thread pool, reused
  * across tasks, never allocated per row or leaked per partition. */
case class DeflateSize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.simpleString}")
  override def prettyName: String = "deflate_size"

  override def nullSafeEval(input: Any): Any =
    DeflateSize.deflatedSize(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.DeflateSize.deflatedSize($c.getBytes());"
    })

  override protected def withNewChildInternal(newChild: Expression): DeflateSize =
    copy(child = newChild)
}

object DeflateSize {
  /** Deterministic: `Deflater` at a fixed level/strategy is a pure function
    * of the input bytes (zlib ships in the JDK, same version everywhere). */
  final val Level = 6

  private val local = new ThreadLocal[(java.util.zip.Deflater, Array[Byte])] {
    override def initialValue(): (java.util.zip.Deflater, Array[Byte]) =
      (new java.util.zip.Deflater(Level), new Array[Byte](1 << 16))
  }

  /** Called from generated code — must stay public and static-shaped. */
  def deflatedSize(bytes: Array[Byte]): Long = {
    val (defl, buf) = local.get()
    defl.reset(); defl.setInput(bytes); defl.finish()
    var total = 0L
    while (!defl.finished()) total += defl.deflate(buf)
    total
  }
}

object Native {

  /** Column API for the native expression. */
  def cosineSim(a: Column, b: Column): Column =
    bridge.column(CosineSim(bridge.expression(a), bridge.expression(b)))

  /** Column API for native NFC normalization. */
  def nfcNormalize(s: Column): Column =
    bridge.column(NfcNormalize(bridge.expression(s)))

  /** Column API for the fused MinHash signature over a shingle array. */
  def minhashSig(shingles: Column, numHashes: Int): Column =
    bridge.column(MinHashSig(bridge.expression(shingles), numHashes))

  /** Column API for the native deflate-size expression. */
  def deflateSize(s: Column): Column =
    bridge.column(DeflateSize(bridge.expression(s)))

  private val cosineInfo = new ExpressionInfo(
    classOf[CosineSim].getName, "cosine_sim")

  private val minhashInfo = new ExpressionInfo(
    classOf[MinHashSig].getName, "minhash_sig")

  private[functions] def minhashFromSql(children: Seq[Expression]): MinHashSig = {
    if (children.size != 2)
      throw new IllegalArgumentException(
        s"minhash_sig(shingles, k) takes exactly 2 arguments, got ${children.size}")
    if (!children(1).foldable)
      throw new IllegalArgumentException(
        "minhash_sig(shingles, k): k must be a literal integer")
    MinHashSig(children(0), children(1).eval().asInstanceOf[Number].intValue())
  }

  private val nfcInfo = new ExpressionInfo(
    classOf[NfcNormalize].getName, "nfc_normalize")

  private val deflateInfo = new ExpressionInfo(
    classOf[DeflateSize].getName, "deflate_size")

  /** Runtime registration so `expr("cosine_sim(a, b)")` / SQL works on an
    * existing session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("cosine_sim"), cosineInfo,
      (children: Seq[Expression]) => CosineSim(children(0), children(1)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("minhash_sig"), minhashInfo, minhashFromSql _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("nfc_normalize"), nfcInfo,
      (children: Seq[Expression]) => NfcNormalize(children.head))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("deflate_size"), deflateInfo,
      (children: Seq[Expression]) => DeflateSize(children.head))
  }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` injects the native
  * functions AND the custom operator strategies at session build time (the
  * SparkSessionExtensions path). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSim(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      Native.minhashFromSql _))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[Expression]) => NfcNormalize(children.head)))
    ext.injectFunction((
      FunctionIdentifier("deflate_size"),
      new ExpressionInfo(classOf[DeflateSize].getName, "deflate_size"),
      (children: Seq[Expression]) => DeflateSize(children.head)))
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    ext.injectOptimizerRule(_ => graft.plans.FuseCosineRule)
  }
}
