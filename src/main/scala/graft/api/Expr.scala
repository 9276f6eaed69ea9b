package graft.api

import org.apache.spark.sql.{Column, functions => F}

/** Scalar expression mini-DSL — the engine-portable expression language.
  *
  * This is the complete scalar surface the reference can push into Catalyst
  * (emma-spark api/spark/SparkExp.scala:29-120): structural access/construction,
  * null tests, null-safe comparisons, boolean algebra, arithmetic, and
  * startsWith/contains. Everything beyond it runs as a typed Scala lambda.
  *
  * `Expr.eval` lowers a tree to a Catalyst `Column`, so filters/projections/
  * join keys written as `Expr` get predicate pushdown, column pruning and
  * whole-stage codegen — the reference needs a compiler analysis
  * (SparkSpecializeOps.scala:36-130) to recover this; here it is the API.
  */
sealed trait Expr {
  def col: Column = Expr.eval(this)

  def proj(field: String): Expr = Expr.Proj(this, field)
  def isNull: Expr = Expr.IsNull(this)
  def isNotNull: Expr = Expr.IsNotNull(this)
  def ===(that: Expr): Expr = Expr.Eq(this, that)
  def =!=(that: Expr): Expr = Expr.Ne(this, that)
  def >(that: Expr): Expr = Expr.Gt(this, that)
  def <(that: Expr): Expr = Expr.Lt(this, that)
  def >=(that: Expr): Expr = Expr.Geq(this, that)
  def <=(that: Expr): Expr = Expr.Leq(this, that)
  def unary_! : Expr = Expr.Not(this)
  def ||(that: Expr): Expr = Expr.Or(this, that)
  def &&(that: Expr): Expr = Expr.And(this, that)
  def +(that: Expr): Expr = Expr.Plus(this, that)
  def -(that: Expr): Expr = Expr.Minus(this, that)
  def *(that: Expr): Expr = Expr.Multiply(this, that)
  def /(that: Expr): Expr = Expr.Divide(this, that)
  def %(that: Expr): Expr = Expr.Mod(this, that)
  def startsWith(prefix: Expr): Expr = Expr.StartsWith(this, prefix)
  def contains(substr: Expr): Expr = Expr.Contains(this, substr)
}

object Expr {
  /** The input row (reference SparkExp.Root). */
  case object Root extends Expr
  /** Field access, `Root.proj("a").proj("b")` ⇒ `col("a.b")`. */
  final case class Proj(of: Expr, field: String) extends Expr
  /** Record construction from named sub-expressions. */
  final case class Struct(fields: Seq[(String, Expr)]) extends Expr
  final case class Lit(value: Any) extends Expr

  final case class IsNull(e: Expr) extends Expr
  final case class IsNotNull(e: Expr) extends Expr
  final case class Eq(l: Expr, r: Expr) extends Expr
  final case class Ne(l: Expr, r: Expr) extends Expr
  final case class Gt(l: Expr, r: Expr) extends Expr
  final case class Lt(l: Expr, r: Expr) extends Expr
  final case class Geq(l: Expr, r: Expr) extends Expr
  final case class Leq(l: Expr, r: Expr) extends Expr
  final case class Not(e: Expr) extends Expr
  final case class Or(l: Expr, r: Expr) extends Expr
  final case class And(l: Expr, r: Expr) extends Expr
  final case class Plus(l: Expr, r: Expr) extends Expr
  final case class Minus(l: Expr, r: Expr) extends Expr
  final case class Multiply(l: Expr, r: Expr) extends Expr
  final case class Divide(l: Expr, r: Expr) extends Expr
  final case class Mod(l: Expr, r: Expr) extends Expr
  final case class StartsWith(str: Expr, prefix: Expr) extends Expr
  final case class Contains(str: Expr, substr: Expr) extends Expr

  def field(name: String): Expr = Proj(Root, name)
  def lit(v: Any): Expr = Lit(v)
  def struct(fields: (String, Expr)*): Expr = Struct(fields)

  /** Lower to a Catalyst Column. Equality is null-safe (`eqNullSafe`), like
    * the reference's generated joins/filters (SparkExp.scala:87-90) — Scala
    * `==` on Options/nulls never yields null. */
  def eval(e: Expr): Column = e match {
    case Root            => F.col("*")
    case Proj(Root, f)   => F.col(f)
    case Proj(of, f)     => eval(of).getField(f)
    case Struct(fs)      => F.struct(fs.map { case (n, x) => eval(x).as(n) }: _*)
    case Lit(v)          => F.lit(v)
    case IsNull(x)       => eval(x).isNull
    case IsNotNull(x)    => eval(x).isNotNull
    case Eq(l, r)        => eval(l) <=> eval(r)
    case Ne(l, r)        => !(eval(l) <=> eval(r))
    case Gt(l, r)        => eval(l) > eval(r)
    case Lt(l, r)        => eval(l) < eval(r)
    case Geq(l, r)       => eval(l) >= eval(r)
    case Leq(l, r)       => eval(l) <= eval(r)
    case Not(x)          => !eval(x)
    case Or(l, r)        => eval(l) || eval(r)
    case And(l, r)       => eval(l) && eval(r)
    case Plus(l, r)      => eval(l) + eval(r)
    case Minus(l, r)     => eval(l) - eval(r)
    case Multiply(l, r)  => eval(l) * eval(r)
    case Divide(l, r)    => eval(l) / eval(r)
    case Mod(l, r)       => eval(l) % eval(r)
    case StartsWith(s, p)  => eval(s).startsWith(eval(p))
    case Contains(s, c)    => eval(s).contains(eval(c))
  }
}
