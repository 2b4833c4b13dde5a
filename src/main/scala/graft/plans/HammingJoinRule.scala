package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.First
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule: a pairwise Hamming-distance join written the naive way —
  *
  * {{{ a.crossJoin(b).filter(bit_count(a("h") ^ b("h")) < k)   // k <= 7 }}}
  *
  * — plans as a cartesian nested-loop (O(N²) at any cluster size). For
  * 64-bit hashes and k ≤ 7 the Manku/Charikar piece decomposition makes an
  * EXACT rewrite available: split each hash into 8 bytes; a pair within
  * Hamming distance d ≤ 6 has ≥ 2 undamaged bytes (pigeonhole), so it
  * shares at least one of the C(8,2) = 28 (byte-pair, values) keys. The
  * rule rewrites the join to explode the 28 keys per row, equi-join on the
  * key, and keep the ORIGINAL predicate as the exact residual — candidacy
  * is lossless for d ≤ 6, so `<  k ≤ 7` and `<= k ≤ 6` rewrite; larger
  * thresholds are left untouched.
  *
  * Multiplicity: the same row pair can share several keys, so each side is
  * tagged with `monotonically_increasing_id()` BELOW the explode and the
  * join is grouped back on the two ids (an Aggregate taking `first` of
  * every payload column, aliased to the original exprIds — the same
  * construction ReplaceDeduplicateWithAggregate uses, because that batch
  * has already run when operator-optimization rules fire). Duplicate input
  * rows carry distinct ids, so input multiplicity is preserved exactly.
  *
  * Guards: Inner/Cross joins whose condition has NO equi-conjunct (anything
  * with an equality key already hash-partitions; it also makes the rule a
  * fixpoint — the rewritten join gains a key equality and can't match
  * again), both hash sides 64-bit integral, each referencing exactly one
  * join side. The rule fires inside the operator-optimization batch, after
  * PushPredicateThroughJoin has moved the user's filter into the join
  * condition.
  *
  * Injected by [[graft.functions.GraftExtensions]]
  * (`spark.sql.extensions=graft.functions.GraftExtensions`).
  */
object HammingJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private val Pairs: Seq[(Int, Int)] =
    for (i <- 0 until 8; j <- (i + 1) until 8) yield (i, j)

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case j @ Join(left, right, Inner | Cross, Some(cond), _)
        if left.resolved && right.resolved =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hasEqui = conjuncts.exists {
        case EqualTo(l, r) => separable(l, r, left, right).isDefined
        case EqualNullSafe(l, r) => separable(l, r, left, right).isDefined
        case _ => false
      }
      val hamming = if (hasEqui) None else conjuncts.view.flatMap(matchHamming(_, left, right)).headOption
      hamming match {
        case Some((hl, hr)) => rewrite(j, hl, hr)
        case None => j
      }
  }

  /** (leftSideExpr, rightSideExpr) when each input references exactly one
    * distinct join side.
    */
  private def separable(a: Expression, b: Expression,
                        left: LogicalPlan, right: LogicalPlan): Option[(Expression, Expression)] = {
    def side(e: Expression): Option[Boolean] =
      if (e.references.nonEmpty && e.references.subsetOf(left.outputSet)) Some(true)
      else if (e.references.nonEmpty && e.references.subsetOf(right.outputSet)) Some(false)
      else None
    (side(a), side(b)) match {
      case (Some(true), Some(false)) => Some((a, b))
      case (Some(false), Some(true)) => Some((b, a))
      case _ => None
    }
  }

  /** Matches `bit_count(l ^ r) < k` (k ≤ 7) / `<= k` (k ≤ 6), either
    * operand order, long-typed hashes only.
    */
  private def matchHamming(e: Expression, left: LogicalPlan,
                           right: LogicalPlan): Option[(Expression, Expression)] = {
    def fromCount(bc: Expression): Option[(Expression, Expression)] = bc match {
      case BitwiseCount(BitwiseXor(a, b)) if a.dataType == LongType && b.dataType == LongType =>
        separable(a, b, left, right)
      case _ => None
    }
    e match {
      case LessThan(bc, IntegerLiteral(k)) if k >= 1 && k <= 7 => fromCount(bc)
      case LessThanOrEqual(bc, IntegerLiteral(k)) if k >= 0 && k <= 6 => fromCount(bc)
      case GreaterThan(IntegerLiteral(k), bc) if k >= 1 && k <= 7 => fromCount(bc)
      case GreaterThanOrEqual(IntegerLiteral(k), bc) if k >= 0 && k <= 6 => fromCount(bc)
      case _ => None
    }
  }

  private object IntegerLiteral {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Int, _) => Some(v.toLong)
      case Literal(v: Long, LongType) => Some(v)
      case _ => None
    }
  }

  /** child → (plan with id + exploded band key, idAttr, keyAttr) */
  private def banded(child: LogicalPlan, hash: Expression,
                     tag: String): (LogicalPlan, Attribute, Attribute) = {
    val idAlias = Alias(MonotonicallyIncreasingID(), s"__graft_hj_id_$tag")()
    val withId = Project(child.output :+ idAlias, child)
    val keys = CreateArray(Pairs.zipWithIndex.map { case ((i, j), idx) =>
      val pi = BitwiseAnd(ShiftRightUnsigned(hash, Literal(8 * i)), Literal(0xffL))
      val pj = BitwiseAnd(ShiftRightUnsigned(hash, Literal(8 * j)), Literal(0xffL))
      BitwiseOr(BitwiseOr(Literal(idx.toLong << 16), ShiftLeft(pi, Literal(8))), pj)
    })
    val keyAttr = AttributeReference(s"__graft_hj_key_$tag", LongType,
      nullable = keys.dataType.asInstanceOf[ArrayType].containsNull)()
    val gen = Generate(Explode(keys), unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(keyAttr), child = withId)
    (gen, idAlias.toAttribute, keyAttr)
  }

  private def rewrite(j: Join, hl: Expression, hr: Expression): LogicalPlan = {
    val (genL, idL, keyL) = banded(j.left, hl, "l")
    val (genR, idR, keyR) = banded(j.right, hr, "r")
    val joined = Join(genL, genR, Inner,
      Some(And(EqualTo(keyL, keyR), j.condition.get)), j.hint)
    // first() per payload column aliased to the ORIGINAL exprIds, grouped
    // on the row-id pair — restores exactly-one output row per matching
    // input row pair (ReplaceDeduplicateWithAggregate's construction)
    val aggCols = (idL :: idR :: Nil) ++ j.output.map { a =>
      Alias(First(a, ignoreNulls = false).toAggregateExpression(), a.name)(exprId = a.exprId)
    }
    Project(j.output, Aggregate(Seq(idL, idR), aggCols, joined))
  }
}
