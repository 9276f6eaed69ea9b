package graft.api

import org.apache.spark.sql.SparkSession

/** Cross-FILE helper for ComprehensionSpec's still-abort coverage: its
  * owner is not on any other file's macro-call-site owner chain, so the
  * Lib.expand-style inliner must NOT splice it (there is no cross-file AST
  * registry) — a dependent generator built by this call keeps the
  * compile-time abort. */
object CrossFileLib {
  def matching(x: (Long, Long))(implicit spark: SparkSession): DataBag[(Long, Long)] = {
    import spark.implicits._
    DataBag(Seq(x))
  }
}
