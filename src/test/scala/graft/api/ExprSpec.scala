package graft.api

import org.apache.spark.sql.{Encoders, SparkSession}
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.api.Expr.{field, lit => elit}

case class Person(name: String, age: Int, city: Option[String])

/** Expr DSL lowering — the reference's SparkExp surface (SparkExp.scala:29-120)
  * as a first-class API: filters/projections written as Expr reach Catalyst. */
class ExprSpec extends AnyFlatSpec with Matchers {

  implicit lazy val spark: SparkSession = TestSpark.spark

  private implicit val enc: org.apache.spark.sql.Encoder[Person] = Encoders.product[Person]
  private lazy val people = DataBag(Seq(
    Person("ann", 30, Some("berlin")),
    Person("bob", 20, None),
    Person("carla", 41, Some("paris"))))

  "comparisons and boolean algebra" should "filter like the lambda path" in {
    val e = (field("age") >= elit(30)) && !(field("name") === elit("carla"))
    val got = people.where(e).collect()
    got shouldBe people.filter(p => p.age >= 30 && p.name != "carla").collect()
  }

  "null-safe equality" should "treat None as a comparable value" in {
    people.where(field("city") === elit("berlin")).collect()
      .map(_.name) shouldBe Seq("ann")
    people.where(field("city").isNull).collect().map(_.name) shouldBe Seq("bob")
    // Ne over a null never returns null rows silently:
    people.where(field("city") =!= elit("berlin")).collect()
      .map(_.name).sorted shouldBe Seq("bob", "carla")
  }

  "arithmetic and string predicates" should "lower to Catalyst" in {
    people.where((field("age") % elit(2)) === elit(0)).collect()
      .map(_.name).sorted shouldBe Seq("ann", "bob")
    people.where(field("name").startsWith(elit("c"))).collect()
      .map(_.name) shouldBe Seq("carla")
    people.where(field("name").contains(elit("ob"))).collect()
      .map(_.name) shouldBe Seq("bob")
  }

  "struct construction" should "project into a new typed record" in {
    implicit val enc2: org.apache.spark.sql.Encoder[(String, Int)] =
      Encoders.tuple(Encoders.STRING, Encoders.scalaInt)
    val r = people.project[(String, Int)](
      Expr.struct("_1" -> field("name"), "_2" -> (field("age") + elit(1))))
    r.collect().sorted shouldBe Seq(("ann", 31), ("bob", 21), ("carla", 42))
  }

  "expr filters" should "push down to the parquet scan" in {
    val dir = java.nio.file.Files.createTempDirectory("graft_expr").toString
    people.writeParquet(s"$dir/p")
    val bag = DataBag.readParquet[Person](s"$dir/p")
    val plan = bag.where(field("age") > elit(25)).ds
      .queryExecution.executedPlan.toString
    plan should include("PushedFilters: [IsNotNull(age), GreaterThan(age,25)]")
  }
}
