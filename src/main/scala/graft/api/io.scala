package graft.api

/** CSV format configuration (surface mirrors reference io/csv/CSV.scala:35-52;
  * fields map 1:1 onto Spark DataFrameReader/Writer options). */
case class CSV(
    header: Boolean = false,
    delimiter: Char = ',',
    charset: String = "UTF-8",
    quote: Option[Char] = Some('"'),
    escape: Option[Char] = Some('\\'),
    comment: Option[Char] = None,
    nullValue: String = "") {
  def readerOptions: Map[String, String] = Map(
    "header" -> header.toString,
    "sep" -> delimiter.toString,
    "encoding" -> charset,
    "nullValue" -> nullValue,
    "mode" -> "PERMISSIVE"
  ) ++ quote.map("quote" -> _.toString) ++
    escape.map("escape" -> _.toString) ++
    comment.map("comment" -> _.toString)

  def writerOptions: Map[String, String] = Map(
    "header" -> header.toString,
    "sep" -> delimiter.toString,
    "encoding" -> charset,
    "nullValue" -> nullValue
  ) ++ quote.map("quote" -> _.toString) ++ escape.map("escape" -> _.toString)
}

/** Parquet format configuration (mirrors reference io/parquet/Parquet.scala:33-78). */
case class Parquet(codec: String = "snappy") {
  def options: Map[String, String] = Map("compression" -> codec)
}

/** One CSV field's render/parse pair — the driver-side analogue of the
  * reference's per-type CSV column converters (reference
  * io/csv/CSVColumn.scala), powering [[LocalBag]]'s SparkSession-free IO. */
trait CsvField[A] extends Serializable {
  def write(a: A): String
  def read(s: String): A
}

object CsvField {
  private def of[A](w: A => String, r: String => A): CsvField[A] =
    new CsvField[A] {
      def write(a: A): String = w(a)
      def read(s: String): A = r(s)
    }
  implicit val string: CsvField[String] = of(identity, identity)
  implicit val int: CsvField[Int] = of(_.toString, _.toInt)
  implicit val long: CsvField[Long] = of(_.toString, _.toLong)
  implicit val short: CsvField[Short] = of(_.toString, _.toShort)
  implicit val byte: CsvField[Byte] = of(_.toString, _.toByte)
  implicit val double: CsvField[Double] = of(_.toString, _.toDouble)
  implicit val float: CsvField[Float] = of(_.toString, _.toFloat)
  implicit val boolean: CsvField[Boolean] = of(_.toString, _.toBoolean)
  implicit val bigDecimal: CsvField[BigDecimal] = of(_.toString, BigDecimal(_))
}

/** Whole-record CSV codec: arity + field render/parse. Instances exist for
  * single fields and TupleN of fields (the shapes the reference's local
  * backend reads/writes, api/ScalaSeq.scala:98-135); nulls and embedded
  * newlines are out of scope, matching the reference's local support. */
trait CsvConverter[A] extends Serializable {
  def arity: Int
  def toFields(a: A): Seq[String]
  def fromFields(fs: Seq[String]): A
}

object CsvConverter {
  implicit def single[A](implicit f: CsvField[A]): CsvConverter[A] =
    new CsvConverter[A] {
      def arity = 1
      def toFields(a: A): Seq[String] = Seq(f.write(a))
      def fromFields(fs: Seq[String]): A = f.read(fs.head)
    }
  implicit def tuple2[A, B](implicit fa: CsvField[A], fb: CsvField[B]): CsvConverter[(A, B)] =
    new CsvConverter[(A, B)] {
      def arity = 2
      def toFields(t: (A, B)): Seq[String] = Seq(fa.write(t._1), fb.write(t._2))
      def fromFields(fs: Seq[String]): (A, B) = (fa.read(fs(0)), fb.read(fs(1)))
    }
  implicit def tuple3[A, B, C](implicit fa: CsvField[A], fb: CsvField[B],
      fc: CsvField[C]): CsvConverter[(A, B, C)] =
    new CsvConverter[(A, B, C)] {
      def arity = 3
      def toFields(t: (A, B, C)): Seq[String] =
        Seq(fa.write(t._1), fb.write(t._2), fc.write(t._3))
      def fromFields(fs: Seq[String]): (A, B, C) =
        (fa.read(fs(0)), fb.read(fs(1)), fc.read(fs(2)))
    }
  implicit def tuple4[A, B, C, D](implicit fa: CsvField[A], fb: CsvField[B],
      fc: CsvField[C], fd: CsvField[D]): CsvConverter[(A, B, C, D)] =
    new CsvConverter[(A, B, C, D)] {
      def arity = 4
      def toFields(t: (A, B, C, D)): Seq[String] =
        Seq(fa.write(t._1), fb.write(t._2), fc.write(t._3), fd.write(t._4))
      def fromFields(fs: Seq[String]): (A, B, C, D) =
        (fa.read(fs(0)), fb.read(fs(1)), fc.read(fs(2)), fd.read(fs(3)))
    }
  implicit def tuple5[A, B, C, D, E](implicit fa: CsvField[A], fb: CsvField[B],
      fc: CsvField[C], fd: CsvField[D], fe: CsvField[E]): CsvConverter[(A, B, C, D, E)] =
    new CsvConverter[(A, B, C, D, E)] {
      def arity = 5
      def toFields(t: (A, B, C, D, E)): Seq[String] =
        Seq(fa.write(t._1), fb.write(t._2), fc.write(t._3), fd.write(t._4),
          fe.write(t._5))
      def fromFields(fs: Seq[String]): (A, B, C, D, E) =
        (fa.read(fs(0)), fb.read(fs(1)), fc.read(fs(2)), fd.read(fs(3)),
          fe.read(fs(4)))
    }
}

/** One Parquet field's type + read/write pair over the parquet-mr example
  * Group API — the driver-side analogue of the reference's per-type
  * Parquet column converters (reference io/parquet/ParquetColumn.scala),
  * powering [[LocalBag]]'s SparkSession-free Parquet IO. */
trait ParquetField[A] extends Serializable {
  def typ(name: String): org.apache.parquet.schema.Type
  def write(g: org.apache.parquet.example.data.Group, name: String, a: A): Unit
  def read(g: org.apache.parquet.example.data.Group, name: String): A
}

object ParquetField {
  import org.apache.parquet.example.data.Group
  import org.apache.parquet.io.api.Binary
  import org.apache.parquet.schema.{LogicalTypeAnnotation, Type, Types}
  import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

  implicit val string: ParquetField[String] = new ParquetField[String] {
    def typ(name: String): Type = Types.required(BINARY)
      .as(LogicalTypeAnnotation.stringType()).named(name)
    def write(g: Group, name: String, a: String): Unit = {
      // ParquetField schemas are all `required` (the CSV codecs share the
      // non-null contract): a null String cannot be written, and a
      // Spark-written file whose string column is optional-with-nulls
      // cannot be read back through this codec — name the field instead
      // of NPEing inside parquet-mr
      require(a != null,
        s"ParquetField[String]: field '$name' is null — LocalBag Parquet " +
        "fields are `required` (non-null); filter nulls or model the " +
        "field as a sentinel before writing")
      g.add(name, Binary.fromString(a))
    }
    def read(g: Group, name: String): String = {
      require(g.getFieldRepetitionCount(name) > 0,
        s"ParquetField[String]: field '$name' has no value in this row " +
        "(optional/null column, likely Spark-written with nulls) — " +
        "LocalBag's codec reads `required` fields only; use " +
        "DataBag.readParquet for nullable data")
      g.getBinary(name, 0).toStringUsingUTF8
    }
  }
  implicit val long: ParquetField[Long] = new ParquetField[Long] {
    def typ(name: String): Type = Types.required(INT64).named(name)
    def write(g: Group, name: String, a: Long): Unit = g.add(name, a)
    def read(g: Group, name: String): Long = g.getLong(name, 0)
  }
  implicit val int: ParquetField[Int] = new ParquetField[Int] {
    def typ(name: String): Type = Types.required(INT32).named(name)
    def write(g: Group, name: String, a: Int): Unit = g.add(name, a)
    def read(g: Group, name: String): Int = g.getInteger(name, 0)
  }
  implicit val double: ParquetField[Double] = new ParquetField[Double] {
    def typ(name: String): Type = Types.required(DOUBLE).named(name)
    def write(g: Group, name: String, a: Double): Unit = g.add(name, a)
    def read(g: Group, name: String): Double = g.getDouble(name, 0)
  }
  implicit val float: ParquetField[Float] = new ParquetField[Float] {
    def typ(name: String): Type = Types.required(FLOAT).named(name)
    def write(g: Group, name: String, a: Float): Unit = g.add(name, a)
    def read(g: Group, name: String): Float = g.getFloat(name, 0)
  }
  implicit val boolean: ParquetField[Boolean] = new ParquetField[Boolean] {
    def typ(name: String): Type = Types.required(BOOLEAN).named(name)
    def write(g: Group, name: String, a: Boolean): Unit = g.add(name, a)
    def read(g: Group, name: String): Boolean = g.getBoolean(name, 0)
  }
}

/** Whole-record Parquet codec: schema + row render/parse over parquet-mr
  * Groups. Field NAMES match the distributed twin's Dataset columns —
  * `value` for a single field, `_1.._n` for tuples — so files round-trip
  * across [[LocalBag]] and [[DataBag]] in both directions. */
trait ParquetConverter[A] extends Serializable {
  def schema: org.apache.parquet.schema.MessageType
  def write(g: org.apache.parquet.example.data.Group, a: A): Unit
  def read(g: org.apache.parquet.example.data.Group): A
}

object ParquetConverter {
  import org.apache.parquet.example.data.Group
  import org.apache.parquet.schema.{MessageType, Types}

  private def msg(fields: Seq[org.apache.parquet.schema.Type]): MessageType = {
    val b = Types.buildMessage()
    fields.foreach(b.addField)
    b.named("spark_schema")
  }

  implicit def single[A](implicit f: ParquetField[A]): ParquetConverter[A] =
    new ParquetConverter[A] {
      val schema: MessageType = msg(Seq(f.typ("value")))
      def write(g: Group, a: A): Unit = f.write(g, "value", a)
      def read(g: Group): A = f.read(g, "value")
    }
  implicit def tuple2[A, B](implicit fa: ParquetField[A],
      fb: ParquetField[B]): ParquetConverter[(A, B)] =
    new ParquetConverter[(A, B)] {
      val schema: MessageType = msg(Seq(fa.typ("_1"), fb.typ("_2")))
      def write(g: Group, t: (A, B)): Unit = {
        fa.write(g, "_1", t._1); fb.write(g, "_2", t._2)
      }
      def read(g: Group): (A, B) = (fa.read(g, "_1"), fb.read(g, "_2"))
    }
  implicit def tuple3[A, B, C](implicit fa: ParquetField[A], fb: ParquetField[B],
      fc: ParquetField[C]): ParquetConverter[(A, B, C)] =
    new ParquetConverter[(A, B, C)] {
      val schema: MessageType = msg(Seq(fa.typ("_1"), fb.typ("_2"), fc.typ("_3")))
      def write(g: Group, t: (A, B, C)): Unit = {
        fa.write(g, "_1", t._1); fb.write(g, "_2", t._2); fc.write(g, "_3", t._3)
      }
      def read(g: Group): (A, B, C) =
        (fa.read(g, "_1"), fb.read(g, "_2"), fc.read(g, "_3"))
    }
  implicit def tuple4[A, B, C, D](implicit fa: ParquetField[A],
      fb: ParquetField[B], fc: ParquetField[C],
      fd: ParquetField[D]): ParquetConverter[(A, B, C, D)] =
    new ParquetConverter[(A, B, C, D)] {
      val schema: MessageType =
        msg(Seq(fa.typ("_1"), fb.typ("_2"), fc.typ("_3"), fd.typ("_4")))
      def write(g: Group, t: (A, B, C, D)): Unit = {
        fa.write(g, "_1", t._1); fb.write(g, "_2", t._2)
        fc.write(g, "_3", t._3); fd.write(g, "_4", t._4)
      }
      def read(g: Group): (A, B, C, D) =
        (fa.read(g, "_1"), fb.read(g, "_2"), fc.read(g, "_3"), fd.read(g, "_4"))
    }
  implicit def tuple5[A, B, C, D, E](implicit fa: ParquetField[A],
      fb: ParquetField[B], fc: ParquetField[C], fd: ParquetField[D],
      fe: ParquetField[E]): ParquetConverter[(A, B, C, D, E)] =
    new ParquetConverter[(A, B, C, D, E)] {
      val schema: MessageType = msg(Seq(fa.typ("_1"), fb.typ("_2"),
        fc.typ("_3"), fd.typ("_4"), fe.typ("_5")))
      def write(g: Group, t: (A, B, C, D, E)): Unit = {
        fa.write(g, "_1", t._1); fb.write(g, "_2", t._2)
        fc.write(g, "_3", t._3); fd.write(g, "_4", t._4); fe.write(g, "_5", t._5)
      }
      def read(g: Group): (A, B, C, D, E) = (fa.read(g, "_1"), fb.read(g, "_2"),
        fc.read(g, "_3"), fd.read(g, "_4"), fe.read(g, "_5"))
    }
}
