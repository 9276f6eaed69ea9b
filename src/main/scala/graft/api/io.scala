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
