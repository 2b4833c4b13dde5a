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

/** MinHash agreement fraction (the cheap Jaccard estimate of the scoring
  * gate) as a native expression: operates directly on catalyst ArrayData —
  * no Seq[Long] materialization per row — and inlines into whole-stage
  * codegen. Empty or length-mismatched signatures estimate 0.0 (the
  * round-1 UDF's semantics, preserved bit-for-bit).
  */
case class MinhashAgreeExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.types.{ArrayType, LongType}

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minhash_agree"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_minhash_agree expects (array<bigint>, array<bigint>), got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    MinhashAgreeExpr.agree(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.MinhashAgreeExpr.agree($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinhashAgreeExpr =
    copy(left = newLeft, right = newRight)
}

object MinhashAgreeExpr {
  def agree(a: org.apache.spark.sql.catalyst.util.ArrayData,
            b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val n = a.numElements()
    if (n == 0 || n != b.numElements()) return 0.0
    var same = 0
    var i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) same += 1; i += 1 }
    same.toDouble / n
  }
}

/** Intersection size of two ASCENDING-sorted int arrays by linear merge,
  * as a native expression on catalyst ArrayData — the per-pair kernel of
  * q_lsh_empirical's O((N/k)²) census over dictionary-coded shingle sets.
  * A Scala UDF here pays CatalystTypeConverters boxing of every element
  * into java.lang.Integer per call (measured: 4.4 s → 18 s on the sf0.1
  * census — worse than the string array_intersect it replaced); this
  * expression reads ints straight off the ArrayData inside whole-stage
  * codegen. Sortedness is the CALLER's contract (sort_array upstream);
  * unsorted input undercounts rather than erroring, so keep the
  * derivation next to the sort.
  */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.types.{ArrayType, IntegerType}

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_sorted_intersect"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_sorted_intersect expects (array<int>, array<int>), got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCountExpr.count(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SortedIntersectCountExpr.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCountExpr =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCountExpr {
  def count(a: org.apache.spark.sql.catalyst.util.ArrayData,
            b: org.apache.spark.sql.catalyst.util.ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getInt(i); val y = b.getInt(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1 else j += 1
    }
    c
  }
}

/** Minimum summed-slot Hamming distance over the media-span pairs of two
  * docs — the reference metric (`vptree/vptree.go:60-69`) generalized to
  * multi-span documents, as a native ternary expression on catalyst
  * ArrayData. Sentinel 9999 when either side has no media (the round-1
  * UDF's convention, preserved bit-for-bit). Runs inside the band join's
  * codegen span on every candidate row — the hottest expression in the
  * pipeline.
  */
case class MediaDistExpr(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_media_dist"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_media_dist expects (array<bigint>, array<bigint>, int), got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any, s: Any): Any =
    MediaDistExpr.dist(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      s.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b, s) => s"graft.functions.MediaDistExpr.dist($a, $b, $s)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): MediaDistExpr =
    copy(first = f, second = s, third = t)
}

object MediaDistExpr {
  def dist(ma: org.apache.spark.sql.catalyst.util.ArrayData,
           mb: org.apache.spark.sql.catalyst.util.ArrayData, slots: Int): Int = {
    val na = ma.numElements()
    val nb = mb.numElements()
    // 9999 sentinel covers every "no comparable media" case: empty arrays,
    // arrays shorter than one slot group, and non-positive slots. The
    // function is SQL-registered, so arbitrary user-supplied slots values
    // reach this code — slots <= 0 must not loop forever (j += slots would
    // never advance), and a short array must not leak Int.MaxValue.
    if (slots <= 0 || na < slots || nb < slots) return 9999
    var best = Int.MaxValue
    var i = 0
    while (i + slots <= na) {
      var j = 0
      while (j + slots <= nb) {
        var d = 0
        var k = 0
        while (k < slots) {
          d += java.lang.Long.bitCount(ma.getLong(i + k) ^ mb.getLong(j + k))
          k += 1
        }
        if (d < best) best = d
        j += slots
      }
      i += slots
    }
    best
  }
}

/** Column + SQL surface for the graft-native expressions. */
object GraftFunctions {

  /** Column API: `jw($"a", $"b")` — codegen'd Jaro-Winkler similarity. */
  def jw(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      JaroWinklerExpr(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Column API: MinHash slot-agreement fraction (codegen'd). */
  def minhashAgree(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      MinhashAgreeExpr(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Column API: min summed-slot media Hamming distance (codegen'd). */
  def mediaDist(a: Column, b: Column, slots: Column): Column =
    GraftSqlBridge.column(MediaDistExpr(GraftSqlBridge.expression(a),
      GraftSqlBridge.expression(b), GraftSqlBridge.expression(slots)))

  /** Column API: sorted int-array intersection size (codegen'd). */
  def sortedIntersect(a: Column, b: Column): Column =
    GraftSqlBridge.column(SortedIntersectCountExpr(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  private[functions] val registryEntries: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_jw"),
      new ExpressionInfo(classOf[JaroWinklerExpr].getName, "graft_jw"),
      { args =>
        require(args.length == 2, "graft_jw expects exactly 2 arguments")
        JaroWinklerExpr(args(0), args(1))
      }),
    (FunctionIdentifier("graft_minhash_agree"),
      new ExpressionInfo(classOf[MinhashAgreeExpr].getName, "graft_minhash_agree"),
      { args =>
        require(args.length == 2, "graft_minhash_agree expects exactly 2 arguments")
        MinhashAgreeExpr(args(0), args(1))
      }),
    (FunctionIdentifier("graft_media_dist"),
      new ExpressionInfo(classOf[MediaDistExpr].getName, "graft_media_dist"),
      { args =>
        require(args.length == 3, "graft_media_dist expects exactly 3 arguments")
        MediaDistExpr(args(0), args(1), args(2))
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
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.registryEntries.foreach(ext.injectFunction)
    // naive O(N²) Hamming cross joins → Manku band equi-join (lossless
    // for thresholds ≤ 7); see graft.plans.HammingJoinRule
    ext.injectOptimizerRule(_ => graft.plans.HammingJoinRule)
    // naive O(N²) set-overlap/Jaccard cross joins → element equi-join
    // (lossless: overlap ≥ k ≥ 1 / ratio > 0 imply a shared element);
    // see graft.plans.SetOverlapJoinRule
    ext.injectOptimizerRule(_ => graft.plans.SetOverlapJoinRule)
  }
}
