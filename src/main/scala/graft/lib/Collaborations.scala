package graft.lib

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's IMDb example pipelines, re-expressed Spark-first
  * (reference emma-examples/src/main/scala/org/emmalanguage/examples/imdb/
  * DirectorsMuses.scala:26-77 and GraphPreprocessing.scala:25-53).
  *
  * Input is a role-tagged credits relation `(personID, movieID, creditType)`
  * — the reference's 5-way comprehension (people ⋈ credits ⋈ movies ⋈
  * credits ⋈ people) is two role filters over credits joined on the movie
  * key; person/movie attribute joins belong AFTER the reduction, where the
  * result is small enough to broadcast the dimensions.
  *
  * Scale design: one shuffle for the movie-key self-join, one for the
  * (director, actor) count; the per-director max is a window over the
  * already-reduced counts (partition-local max, no extra join, no orderBy →
  * no sort).
  */
object Collaborations {

  /** Role-filtered collaboration pairs: every (director, actor, movie)
    * credit co-occurrence (duplicates preserved — the reference's bag
    * semantics count repeated credits). */
  def collaborations(credits: DataFrame, directorRole: String = "director",
      actorRole: String = "actor"): DataFrame = {
    val d = credits.where(col("creditType") === directorRole)
      .select(col("personID").as("director"), col("movieID"))
    val a = credits.where(col("creditType") === actorRole)
      .select(col("personID").as("actor"), col("movieID"))
    d.join(a, "movieID")
  }

  /** DirectorsMuses: each director's "muses" — actors with more than one
    * collaboration whose count is within 1 of that director's max
    * (reference DirectorsMuses.scala:45-60). */
  def directorsMuses(credits: DataFrame, directorRole: String = "director",
      actorRole: String = "actor"): DataFrame = {
    val counts = collaborations(credits, directorRole, actorRole)
      .groupBy("director", "actor").agg(count(lit(1)).as("cnt"))
    counts
      .withColumn("maxc", max("cnt").over(Window.partitionBy("director")))
      .where(col("cnt") > 1 && col("cnt") >= col("maxc") - 1)
      .select(col("director"), col("actor"), col("cnt"))
  }

  /** GraphPreprocessing: the labeled collaboration graph — one edge per
    * (director, actor) pair carrying a fold over that pair's collaboration
    * group (reference GraphPreprocessing.scala:48-53's `LEdge(pd, pa,
    * proj(cs))`; the projection is any Spark aggregate expression). */
  def collaborationEdges(credits: DataFrame, label: Column,
      directorRole: String = "director", actorRole: String = "actor"): DataFrame =
    collaborations(credits, directorRole, actorRole)
      .groupBy(col("director").as("src"), col("actor").as("dst"))
      .agg(label.as("label"))
}
