package graft.api

import org.apache.spark.sql.SparkSession

/** Package-level `foo` — the binding [[ScopedLib.viaFoo]]'s bare `foo`
  * has at its definition site (30-row pool). Lives in its OWN compilation
  * unit: a same-unit package member + subsequent import is ambiguous to
  * scalac itself, while the other-unit spelling compiles (import wins) —
  * exactly the unit-dependence that makes the splice-site dual-resolution
  * case unresolvable, hence the abort pinned in ComprehensionSpec. */
object foo {
  def bag(implicit spark: SparkSession): DataBag[(Long, Long)] = {
    import spark.implicits._
    DataBag((1L to 30L).map(i => (i, i % 3)))
  }
}

/** Decoy holder: under the r12 position-blind capture, [[SiblingScope]]'s
  * `import decoy.foo` was captured with every other unit import and
  * OUTRANKED the package-level `foo` — re-binding viaFoo's pool to this
  * 1-row decoy at a foreign splice site (silent mis-binding). */
object decoy {
  object foo {
    def bag(implicit spark: SparkSession): DataBag[(Long, Long)] = {
      import spark.implicits._
      DataBag(Seq((999L, 999L)))
    }
  }
}
