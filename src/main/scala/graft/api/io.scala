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
