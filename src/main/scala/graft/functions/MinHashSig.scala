package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native fused MinHash signature over a shingle-array column.
  *
  * Composed built-ins need explode(shingles) → groupBy(doc) with K
  * min(substring(md5(seed ∥ shingle))) aggregates — a row blow-up of
  * |shingles| per document plus a full shuffle, with ceil(K/4) md5
  * evaluations per EXPLODED row re-done inside each aggregate buffer update.
  * This expression computes the whole K-hash signature in ONE pass over the
  * array inside the scan projection: per shingle, one md5 per 4-hash group,
  * tracked as unsigned 32-bit minima — no explode, no shuffle, no per-row
  * string churn. At 100 TB, signatures become a pure map over the corpus.
  *
  * Bit-compatible with the composed form and the DuckDB oracle: hash i is
  * the 8-hex-char chunk i%4 of md5((i/4) ∥ "-" ∥ shingle), minimized
  * lexicographically (= numerically, fixed-width lowercase hex). Returns
  * null for an empty array (the composed groupBy drops such docs).
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true // empty shingle array -> null
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val cls = MinHashSig.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${childGen.isNull}) {
        ${ev.value} = $cls.compute(${childGen.value}, $numHashes);
        ${ev.isNull} = (${ev.value} == null);
      }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  // "g-" prefixes for the first 16 hash groups (64 hashes); beyond that,
  // computed on the fly
  private val prefixes: Array[Array[Byte]] =
    Array.tabulate(16)(g => (g.toString + "-").getBytes(StandardCharsets.UTF_8))

  private def prefix(g: Int): Array[Byte] =
    if (g < prefixes.length) prefixes(g)
    else (g.toString + "-").getBytes(StandardCharsets.UTF_8)

  private val hexChars = "0123456789abcdef".toCharArray

  private def hex8(v: Long): UTF8String = {
    val cs = new Array[Byte](8)
    var i = 0
    while (i < 8) {
      cs(i) = hexChars(((v >>> (28 - 4 * i)) & 0xf).toInt).toByte
      i += 1
    }
    UTF8String.fromBytes(cs)
  }

  /** One pass over the shingle array -> K unsigned-32 minima -> 8-hex-char
    * strings. Null for empty input (no shingles, no signature). */
  def compute(arr: ArrayData, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val groups = (numHashes + 3) / 4
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val md = mdLocal.get()
    var e = 0
    while (e < n) {
      val s = arr.getUTF8String(e)
      if (s != null) {
        val sb = s.getBytes
        var g = 0
        while (g < groups) {
          md.reset()
          md.update(prefix(g))
          md.update(sb)
          val d = md.digest()
          var j = 0
          while (j < 4) {
            val idx = g * 4 + j
            if (idx < numHashes) {
              val v = ((d(4 * j) & 0xffL) << 24) | ((d(4 * j + 1) & 0xffL) << 16) |
                ((d(4 * j + 2) & 0xffL) << 8) | (d(4 * j + 3) & 0xffL)
              if (v < mins(idx)) mins(idx) = v
            }
            j += 1
          }
          g += 1
        }
      }
      e += 1
    }
    if (mins(0) == Long.MaxValue) return null // only null elements
    new GenericArrayData(mins.map(hex8(_): Any))
  }
}
