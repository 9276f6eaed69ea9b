package graft

import org.apache.spark.sql.functions._

object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$d/documents.parquet")
    def t[A](label: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"STAGE $label%-22s ${(System.nanoTime() - s) / 1e9}%.2f s"); r
    }
    docs.count(); docs.count()
    val sig = t("sig+checkpoint") {
      val s = graft.ops.Dedup.minhashSignatures(docs, numHashes = 8).localCheckpoint()
      s.count(); s
    }
    val bandRows = (0 until 4).map { b =>
      val cols = (b * 2 until (b + 1) * 2).map(i => col(s"mh$i"))
      sig.select(col("doc_id"), lit(b).as("band_id"), concat_ws("|", cols: _*).as("band_key"))
    }.reduce(_ union _)
    t("bandRows count")(println("  rows=" + bandRows.count()))
    val a = bandRows.as("a"); val b2 = bandRows.as("b")
    val joined = a.join(b2, col("a.band_id") === col("b.band_id") &&
      col("a.band_key") === col("b.band_key") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
    t("join raw")(println("  raw=" + joined.count()))
    t("join distinct")(println("  dis=" + joined.distinct().count()))
    t("join again")(println("  raw=" + joined.count()))
    joined.explain("formatted")
  }
}
