package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Curation, Dedup}

/** Ad-hoc stage profiler for the dedup pipeline (test scope, not shipped). */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$d/documents.parquet")

    def t[A](label: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"STAGE $label%-22s ${(System.nanoTime() - s) / 1e9}%.2f s"); r
    }

    println("docs = " + docs.count())
    t("warm")(docs.count())
    val sh = t("shingles") {
      val x = Dedup.shingles(docs); println("  shingles=" + x.count()); x
    }
    t("signatures8") {
      println("  sigs=" + Dedup.minhashSignatures(docs, numHashes = 8).count())
    }
    t("signatures4") {
      println("  sigs=" + Dedup.minhashSignatures(docs, numHashes = 4).count())
    }
    t("signatures4_again") {
      println("  sigs=" + Dedup.minhashSignatures(docs, numHashes = 4).count())
    }
    t("signatures8_again") {
      println("  sigs=" + Dedup.minhashSignatures(docs, numHashes = 8).count())
    }
    t("lsh_pairs") {
      println("  cands=" + Dedup.minhashLSH(docs, bands = 4, rowsPerBand = 2).count())
    }
    t("full_near_dups") {
      println("  pairs=" + Curation.nearDuplicates(docs).where(col("jaccard") >= 0.5).count())
    }
    t("dup_clusters") {
      println("  rows=" + Curation.duplicateClusters(docs).count())
    }
    t("jaccard_window") {
      println("  rows=" + Dedup.ngramJaccard(docs).count())
    }
  }
}
