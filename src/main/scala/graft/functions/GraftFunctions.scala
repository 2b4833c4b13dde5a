package graft.functions

import graft.text.JaroWinkler
import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity as a NATIVE Catalyst expression (SURVEY.md §7.3
  * upgrade path: custom `Expression` with `doGenCode` beats a Scala UDF).
  *
  * Versus the round-1 `jwUdf`: no closure serialization, no
  * catalyst↔Scala value conversion per row (operates on UTF8String), proper
  * null semantics via `nullIntolerant`, and the generated code is a direct
  * static call inlined INSIDE whole-stage codegen — the expression never
  * breaks a codegen span the way a ScalaUDF node does.
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_jw"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[StringType] && right.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jw expects (string, string), got (${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerExpr.jw(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.JaroWinklerExpr.jw($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerExpr {
  /** Static entry point shared by interpreted eval and generated code. */
  def jw(a: UTF8String, b: UTF8String): Double =
    JaroWinkler.jaroWinkler(a.toString, b.toString)
}

/** Column + SQL surface for the graft-native expressions. */
object GraftFunctions {

  /** Column API: `jw($"a", $"b")` — codegen'd Jaro-Winkler similarity. */
  def jw(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      JaroWinklerExpr(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  private[functions] val registryEntries: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_jw"),
      new ExpressionInfo(classOf[JaroWinklerExpr].getName, "graft_jw"),
      { args =>
        require(args.length == 2, "graft_jw expects exactly 2 arguments")
        JaroWinklerExpr(args(0), args(1))
      }))

  /** Register the SQL functions on a LIVE session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    registryEntries.foreach { case (id, info, builder) =>
      GraftSqlBridge.registerFunction(spark, id, info, builder)
    }
}

/** Build-time injection: `SparkSession.builder().withExtensions(new
  * GraftExtensions)` or `--conf spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.registryEntries.foreach(ext.injectFunction)
}
