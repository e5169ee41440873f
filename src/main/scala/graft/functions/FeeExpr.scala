package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the engine's fee computation — the
  * `q_udf_scalar` surface (SURVEY.md §2B). A tiered processing fee over a
  * discounted price:
  *
  *   base = price * (1 - discount)
  *   fee  = base * 0.002 + max(base - 1000, 0) * 0.001 + tax * price * 0.0005
  *
  * Implemented as a real `Expression` with `doGenCode` (not a Scala UDF) so
  * it stays inside whole-stage codegen: no boxing, no closure serialization,
  * and the generated Java is identical arithmetic to [[FeeExpr.compute]],
  * keeping interpreted and codegen paths bit-equal with the DuckDB oracle.
  *
  * The reference computes its fees/balances out-of-engine (Dock's API
  * produces the report, reference README.md:11); in a Spark-native engine a
  * scalar financial formula belongs in the expression layer.
  */
case class FeeExpr(price: Expression, discount: Expression, tax: Expression)
    extends TernaryExpression {

  override def dataType: DataType = DoubleType
  override def first: Expression = price
  override def second: Expression = discount
  override def third: Expression = tax
  override def prettyName: String = "graft_fee"

  override def nullSafeEval(p: Any, d: Any, t: Any): Any =
    FeeExpr.compute(p.asInstanceOf[Double], d.asInstanceOf[Double], t.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, d, t) => {
      val base = ctx.freshName("base")
      s"""
         |double $base = $p * (1.0 - $d);
         |${ev.value} = $base * 0.002 + (($base > 1000.0) ? ($base - 1000.0) * 0.001 : 0.0)
         |  + $t * $p * 0.0005;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): FeeExpr =
    copy(price = newFirst, discount = newSecond, tax = newThird)
}

object FeeExpr {
  /** Reference implementation; the codegen template above must mirror this
    * operation-for-operation (FP addition order matters for oracle parity).
    */
  def compute(p: Double, d: Double, t: Double): Double = {
    val base = p * (1.0 - d)
    base * 0.002 + (if (base > 1000.0) (base - 1000.0) * 0.001 else 0.0) + t * p * 0.0005
  }

  /** DuckDB-equivalent SQL for the same arithmetic, same evaluation order. */
  def sql(p: String, d: String, t: String): String =
    s"($p * (1.0 - $d)) * 0.002 + " +
      s"(CASE WHEN ($p * (1.0 - $d)) > 1000.0 THEN ($p * (1.0 - $d)) - 1000.0 ELSE 0.0 END) * 0.001 + " +
      s"$t * $p * 0.0005"
}

/** Session-level registration of the engine's native functions, so they are
  * callable from SQL text and `expr(...)` like any built-in.
  */
object GraftFunctions {
  /** Arguments are cast to double at registration (the expression itself
    * asserts nothing — `AbstractDataType` is private[sql] in Spark 4, so
    * input coercion is done here instead of via ExpectsInputTypes).
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_fee",
      exprs => FeeExpr(Cast(exprs(0), DoubleType), Cast(exprs(1), DoubleType),
        Cast(exprs(2), DoubleType)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotExpr(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingles", exprs => ShinglesExpr(exprs(0)), "scala_udf")
    // literal-int config args evaluated at registration-build time
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_lsh_bucket",
      exprs => SignProjectExpr(exprs(0),
        nBits = exprs(1).eval().asInstanceOf[Int],
        dims = exprs(2).eval().asInstanceOf[Int],
        salt = exprs(3).eval().asInstanceOf[Int]),
      "scala_udf")
  }
}
