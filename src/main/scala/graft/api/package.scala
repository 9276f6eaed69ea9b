package graft

import org.apache.spark.sql.Dataset

/** API-level implicits (the reference's implicit native-collection wrap,
  * emma-spark api/spark/package.scala:30-48: `Dataset[A] => DataBag[A]`). */
package object api {
  implicit class RichDataset[A](private val ds: Dataset[A]) extends AnyVal {
    /** Wrap a native Dataset as a DataBag (zero-cost view). */
    def toBag: DataBag[A] = DataBag.from(ds)
  }
}
