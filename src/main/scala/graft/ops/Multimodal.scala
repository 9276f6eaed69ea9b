package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads are opaque `binary`
  * columns with typed metadata structs. Decode/feature-extract runs as a
  * partition-local batch transform (`mapPartitions` over rows — the Scala
  * analogue of `mapInPandas`): schema, partitioning, and batch shape are real;
  * the codec itself is STUBBED with a deterministic fake (media libraries are
  * not available in this environment — swap [[decodeStub]] for a real decoder
  * in production).
  *
  * Scale design: payloads never pass through a shuffle — feature extraction is
  * narrow (per-partition), and downstream joins/groupBys carry only the small
  * extracted-feature columns, not the blobs. Partition sizing is governed by
  * `spark.sql.files.maxPartitionBytes`, so executor memory bounds hold no
  * matter how large the corpus is.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true))), nullable = true)))

  /** Wrap a text corpus as a fake media table: payload = UTF-8 bytes. Stands
    * in for `spark.read.format("binaryFile")` in production. */
  def asMediaTable(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(
      col("doc_id"),
      lit("image/fake").as("media_type"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        (length(col(textCol)) % 640).cast("int").as("width"),
        (length(col(textCol)) % 480).cast("int").as("height"),
        lit(null).cast("int").as("sample_rate")).as("meta"))

  /** STUB decoder: a real implementation would decode the image/audio payload
    * here (e.g. via javax.imageio / a JNI codec). The fake is deterministic:
    * "decoded" features are derived from the raw bytes only. */
  private[ops] def decodeStub(payload: Array[Byte]): (Int, Long, Double) = {
    if (payload == null) (0, 0L, 0.0)
    else {
      var checksum = 0L
      var lum = 0.0
      var i = 0
      while (i < payload.length) {
        checksum = checksum * 31 + (payload(i) & 0xff)
        lum += (payload(i) & 0xff)
        i += 1
      }
      (payload.length, checksum, if (payload.length == 0) 0.0 else lum / payload.length)
    }
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("mean_luma", DoubleType, nullable = false)))

  /** Generic partition-local batch transform — the mapInPandas-shaped
    * extension point: one iterator of rows in, one iterator out, no shuffle.
    * Use for any decode/feature-extract stage whose logic lives outside
    * Column expressions (codecs, model inference, external libs). */
  def transformBatches(df: DataFrame, outSchema: StructType)(
      f: Iterator[Row] => Iterator[Row]): DataFrame =
    df.sparkSession.createDataFrame(df.rdd.mapPartitions(f), outSchema)

  /** Partition-local batch feature extraction over the binary column (built
    * on [[transformBatches]]; blobs are dropped from the output so nothing
    * downstream shuffles payload bytes). */
  def extractFeatures(media: DataFrame): DataFrame =
    transformBatches(media.select("doc_id", "payload"), featureSchema) { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        val (n, checksum, luma) = decodeStub(payload)
        Row(id, n, checksum, luma)
      }
    }

  /** STUB resize: a real implementation would decode + rescale the image
    * here; the stand-in keeps every `factor`-th payload byte (deterministic,
    * shape-preserving: binary in, smaller binary out) and scales the metadata
    * dims, exercising the exact plumbing a real resizer needs. */
  def resizeStub(media: DataFrame, factor: Int = 2): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true)))
    transformBatches(media.select(
        col("doc_id"), col("payload"), col("meta.width"), col("meta.height")), outSchema) {
      rows => rows.map { r =>
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        val resized = if (payload == null) null
          else payload.zipWithIndex.collect { case (b, i) if i % factor == 0 => b }
        def scaled(i: Int) = if (r.isNullAt(i)) null else Int.box(r.getInt(i) / factor)
        Row(r.getLong(0), resized, scaled(2), scaled(3))
      }
    }
  }

  /** Frame-sampling shape for video-like payloads: split the payload into
    * fixed-size "frames" and keep every `stride`-th one (columnar, no UDF). */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64, stride: Int = 4): DataFrame =
    media.where(length(col("payload")) > 0) // empty payload -> no frames, not one phantom frame
      .select(col("doc_id"),
      posexplode(transform(
        sequence(lit(0), ((length(col("payload")) - 1) / frameBytes).cast("int"), lit(stride)),
        i => substring(col("payload"), (i * frameBytes + 1).cast("int"), lit(frameBytes)))))
      .withColumnRenamed("pos", "frame_no")
      .withColumnRenamed("col", "frame")
}
