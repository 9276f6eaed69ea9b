package graft.api

import graft.api.alg._

/** Local Seq-backed bag — the reference's `ScalaSeq` backend
  * (emma-language api/ScalaSeq.scala:22-109): the identical bag surface over
  * an in-memory collection, SERIALIZABLE and usable inside closures where a
  * Dataset cannot go (SURVEY §7.4 "nested DataBag in closures" — the
  * reference's own tests comprehend over a local bag inside `flatMap`,
  * DataBagSpec.scala:186-199).
  *
  * Every fold delegates to the same [[Alg]] algebras as the distributed
  * [[DataBag]], so a function written against this surface computes the same
  * value whether it runs on the driver, inside an executor closure, or is
  * re-pointed at a Dataset-backed bag.
  */
final class LocalBag[A](val values: Seq[A]) extends Serializable {

  // ---------------------------------------------------------------- monad ops
  def map[B](f: A => B): LocalBag[B] = new LocalBag(values.map(f))
  def flatMap[B](f: A => LocalBag[B]): LocalBag[B] =
    new LocalBag(values.flatMap(f(_).values))
  def withFilter(p: A => Boolean): LocalBag[A] = new LocalBag(values.filter(p))
  def filter(p: A => Boolean): LocalBag[A] = withFilter(p)

  // -------------------------------------------------------------------- folds
  def fold[B](alg: Alg[A, B]): B =
    values.foldLeft(alg.zero)((b, a) => alg.plus(b, alg.init(a)))
  def fold[B](zero: B)(init: A => B, plus: (B, B) => B): B =
    fold(Fold(zero, init, plus))

  def reduce(zero: A)(p: (A, A) => A): A = fold(Reduce(zero, p))
  def reduceOption(p: (A, A) => A): Option[A] = fold(ReduceOpt(p))
  def isEmpty: Boolean = values.isEmpty
  def nonEmpty: Boolean = values.nonEmpty
  def size: Long = values.size.toLong
  def count(p: A => Boolean): Long = values.count(p).toLong
  def min(implicit ord: Ordering[A]): A = fold(Min(ord)).get
  def max(implicit ord: Ordering[A]): A = fold(Max(ord)).get
  def minBy[K](k: A => K)(implicit ord: Ordering[K]): Option[A] = fold(Min(Ordering.by(k)))
  def maxBy[K](k: A => K)(implicit ord: Ordering[K]): Option[A] = fold(Max(Ordering.by(k)))
  def sum(implicit num: Numeric[A]): A = fold(Sum(num))
  def product(implicit num: Numeric[A]): A = fold(Product(num))
  def exists(p: A => Boolean): Boolean = values.exists(p)
  def forall(p: A => Boolean): Boolean = values.forall(p)
  def find(p: A => Boolean): Option[A] = values.find(p)
  def bottom(n: Int)(implicit ord: Ordering[A]): List[A] = fold(Bottom(n, ord))
  def top(n: Int)(implicit ord: Ordering[A]): List[A] = fold(Top(n, ord))

  // ------------------------------------------------- grouping / set ops
  def groupBy[K](k: A => K): LocalBag[Group[K, LocalBag[A]]] =
    new LocalBag(values.groupBy(k).toSeq.map { case (key, vs) =>
      Group(key, new LocalBag(vs))
    })
  def foldGroup[K, B](k: A => K, alg: Alg[A, B]): LocalBag[Group[K, B]] =
    new LocalBag(values.groupBy(k).toSeq.map { case (key, vs) =>
      Group(key, new LocalBag(vs).fold(alg))
    })

  def union(that: LocalBag[A]): LocalBag[A] = new LocalBag(values ++ that.values)
  def distinct: LocalBag[A] = new LocalBag(values.distinct)

  // ----------------------------------------------------------------- file IO
  // Driver-side twins of DataBag's sinks (reference ScalaSeq.scala:98-135):
  // no SparkSession anywhere — plain java.nio writes of ONE file. The
  // distributed twin reads these directly, and [[LocalBag.readCSV]]/
  // [[LocalBag.readText]] read the distributed twin's part-file
  // directories, so bags round-trip across the two backends.

  /** Write one CSV file (quoting/escaping per `format`; embedded newlines
    * and nulls are out of scope, as in the reference's local backend). */
  def writeCSV(path: String, format: CSV = CSV())(
      implicit c: CsvConverter[A]): Unit = {
    val sep = format.delimiter
    def render(field: String): String = {
      val needsQuote = field.exists(ch => ch == sep || ch == '\n' || ch == '\r') ||
        format.quote.exists(q => field.indexOf(q.toInt) >= 0)
      format.quote match {
        case Some(q) if needsQuote =>
          val esc = format.escape.getOrElse(q)
          val body = field.flatMap(ch =>
            if (ch == q || ch == esc) s"$esc$ch" else ch.toString)
          s"$q$body$q"
        case _ => field
      }
    }
    val lines = new scala.collection.mutable.ArrayBuffer[String](values.size + 1)
    if (format.header)
      lines += (1 to c.arity).map("_" + _).mkString(sep.toString)
    values.foreach(a => lines += c.toFields(a).map(render).mkString(sep.toString))
    LocalBag.writeLines(path, lines.toSeq, format.charset)
  }

  /** Write one text file, one element per line (String bags only). */
  def writeText(path: String)(implicit ev: A <:< String): Unit =
    LocalBag.writeLines(path, values.map(ev), "UTF-8")

  /** Write one Parquet file — no SparkSession, via parquet-mr's example
    * Group API (the reference's local backend writes Parquet the same
    * way, io/parquet/ParquetScalaSupport.scala). Column names match the
    * distributed twin's Dataset columns (`value` / `_1.._n`), so
    * [[DataBag.readParquet]] reads these files directly. */
  def writeParquet(path: String, format: Parquet = Parquet())(
      implicit pc: ParquetConverter[A]): Unit = {
    import org.apache.hadoop.conf.Configuration
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
    import org.apache.parquet.hadoop.metadata.CompressionCodecName
    val conf = new Configuration()
    GroupWriteSupport.setSchema(pc.schema, conf)
    val codec = CompressionCodecName.valueOf(
      format.codec.toUpperCase(java.util.Locale.ROOT) match {
        case "NONE" => "UNCOMPRESSED"
        case other => other
      })
    // overwrite semantics matching the distributed twin's mode("overwrite"):
    // the target may be a previous Spark-written part-file DIRECTORY — but
    // ONLY that: a directory holding anything other than prior bag output
    // (part-*/_SUCCESS/*.parquet/*.crc entries) is refused instead of
    // recursively deleted, so a mistyped path cannot silently lose an
    // unrelated tree (Spark's own overwrite has the same bounded blast
    // radius: it replaces its own output layout)
    val target = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(target)) {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.isDirectory(target)) {
        val entries = {
          val s = java.nio.file.Files.list(target)
          try s.iterator().asScala.map(_.getFileName.toString).toList
          finally s.close()
        }
        val foreign = entries.filterNot { n =>
          n.startsWith("part-") || n == "_SUCCESS" || n.startsWith("._SUCCESS") ||
            n.endsWith(".parquet") || n.endsWith(".crc") || n.startsWith(".part-")
        }
        require(foreign.isEmpty,
          s"writeParquet refuses to overwrite '$path': directory contains " +
          s"non-bag-output entries ${foreign.take(3).mkString(", ")} — " +
          "delete it explicitly or pick a fresh path")
      }
      val walk = java.nio.file.Files.walk(target)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.delete)
      finally walk.close()
    }
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(path))
      .withConf(conf).withType(pc.schema).withCompressionCodec(codec)
      .build()
    try {
      val factory = new SimpleGroupFactory(pc.schema)
      values.foreach { a =>
        val g = factory.newGroup()
        pc.write(g, a)
        writer.write(g)
      }
    } finally writer.close()
  }

  // --------------------------------------------------------------- conversion
  def collect(): Seq[A] = values
  override def toString: String = values.mkString("LocalBag(", ", ", ")")

  /** Bag equality (multiset semantics, like the reference's DataBag#equals). */
  override def equals(o: Any): Boolean = o match {
    case that: LocalBag[_] =>
      values.groupBy(identity).view.mapValues(_.size).toMap ==
        that.values.groupBy(identity).view.mapValues(_.size).toMap
    case _ => false
  }
  override def hashCode: Int =
    values.groupBy(identity).view.mapValues(_.size).toMap.hashCode
}

object LocalBag {
  def empty[A]: LocalBag[A] = new LocalBag(Seq.empty)
  def apply[A](values: A*): LocalBag[A] = new LocalBag(values.toSeq)
  def of[A](values: Seq[A]): LocalBag[A] = new LocalBag(values)

  /** Read a text file — or a directory of `part-*` files as written by
    * [[DataBag.writeText]] — one element per line, no SparkSession. */
  def readText(path: String): LocalBag[String] =
    new LocalBag(readLines(path, "UTF-8").flatten)

  /** Read a Parquet file — or a directory of `part-*` files as written by
    * [[DataBag.writeParquet]] — without a SparkSession, via parquet-mr's
    * example Group API. Fields are read BY NAME from each file's own
    * schema, so both the local single-file layout and Spark's part-file
    * output parse identically. */
  def readParquet[A](path: String)(
      implicit pc: ParquetConverter[A]): LocalBag[A] = {
    import org.apache.hadoop.conf.Configuration
    import org.apache.parquet.hadoop.ParquetReader
    import org.apache.parquet.hadoop.example.GroupReadSupport
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(path)
    val files: Seq[java.nio.file.Path] =
      if (java.nio.file.Files.isDirectory(p)) {
        val entries = {
          val stream = java.nio.file.Files.list(p)
          try stream.iterator().asScala.toSeq
          finally stream.close()
        }
        // a Spark partitionBy layout nests key=value SUBDIRECTORIES; the
        // flat reader would silently return only the top level's rows —
        // fail loudly instead (read it with DataBag.readParquet)
        val subdirs = entries.filter(java.nio.file.Files.isDirectory(_))
        require(subdirs.isEmpty,
          s"LocalBag.readParquet: '$path' contains subdirectories " +
          s"(${subdirs.take(3).map(_.getFileName).mkString(", ")}) — " +
          "partitioned layouts are not supported by the flat local reader; " +
          "use DataBag.readParquet")
        entries.filter { f =>
          val n = f.getFileName.toString
          n.endsWith(".parquet") && !n.startsWith(".") && !n.startsWith("_")
        }.sortBy(_.getFileName.toString)
      } else Seq(p)
    val conf = new Configuration()
    val out = Seq.newBuilder[A]
    files.foreach { f =>
      val reader = ParquetReader
        .builder(new GroupReadSupport(), new org.apache.hadoop.fs.Path(f.toString))
        .withConf(conf).build()
      try {
        var g = reader.read()
        while (g != null) {
          out += pc.read(g)
          g = reader.read()
        }
      } finally reader.close()
    }
    new LocalBag(out.result())
  }

  /** Read a CSV file — or a `part-*` directory as written by
    * [[DataBag.writeCSV]] — without a SparkSession. With `header = true`
    * the header is dropped PER FILE: Spark's distributed writer emits a
    * header line into every part file, the local writer into its one file.
    * Empty lines are kept — they are the legitimate encoding of an
    * empty-string single-field row. */
  def readCSV[A](path: String, format: CSV = CSV())(
      implicit c: CsvConverter[A]): LocalBag[A] = {
    val body = readLines(path, format.charset).flatMap { fileLines =>
      if (format.header) fileLines.drop(1) else fileLines
    }
    new LocalBag(body.map(line => c.fromFields(parseLine(line, format))))
  }

  /** One CSV record: a linear scan honoring the quote char (RFC doubled
    * quotes AND the escape char inside quoted fields — both spellings
    * Spark's writer can produce). */
  private[api] def parseLine(line: String, format: CSV): Seq[String] = {
    val sep = format.delimiter
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    var inQ = false
    while (i < line.length) {
      val ch = line(i)
      if (inQ) {
        if (format.escape.contains(ch) && i + 1 < line.length &&
            (format.quote.contains(line(i + 1)) || format.escape.contains(line(i + 1)))) {
          cur += line(i + 1); i += 2
        } else if (format.quote.contains(ch)) {
          if (i + 1 < line.length && format.quote.contains(line(i + 1))) {
            cur += ch; i += 2
          } else { inQ = false; i += 1 }
        } else { cur += ch; i += 1 }
      } else {
        if (ch == sep) { out += cur.result(); cur.clear(); i += 1 }
        else if (format.quote.contains(ch) && cur.isEmpty) { inQ = true; i += 1 }
        else { cur += ch; i += 1 }
      }
    }
    out += cur.result()
    out.toSeq
  }

  /** Lines grouped per file (callers that must treat file boundaries —
    * e.g. per-part CSV headers — need the grouping; flatten otherwise). */
  private def readLines(path: String, charset: String): Seq[Seq[String]] = {
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(path)
    val cs = java.nio.charset.Charset.forName(charset)
    val files =
      if (java.nio.file.Files.isDirectory(p)) {
        val stream = java.nio.file.Files.list(p)
        try stream.iterator().asScala.toSeq
          .filter(f => f.getFileName.toString.startsWith("part-"))
          .sortBy(_.getFileName.toString)
        finally stream.close()
      } else Seq(p)
    files.map(f => java.nio.file.Files.readAllLines(f, cs).asScala.toSeq)
  }

  private[api] def writeLines(path: String, lines: Seq[String],
      charset: String): Unit = {
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, lines.asJava,
      java.nio.charset.Charset.forName(charset))
    ()
  }
}
