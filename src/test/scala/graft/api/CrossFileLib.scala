package graft.api

import org.apache.spark.sql.SparkSession

/** Cross-FILE helper for ComprehensionSpec's still-abort coverage: its
  * owner is not on any other file's macro-call-site owner chain AND it is
  * NOT `@graft.api.lib`-annotated, so neither inliner path may splice it
  * (opting into the cross-file registry is explicit, like the reference's
  * `@emma.lib`) — a dependent generator built by this call keeps the
  * compile-time abort. */
object CrossFileLib {
  def matching(x: (Long, Long))(implicit spark: SparkSession): DataBag[(Long, Long)] = {
    import spark.implicits._
    DataBag(Seq(x))
  }
}
