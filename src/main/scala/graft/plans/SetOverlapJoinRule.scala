package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.First
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: a set-similarity join written the naive way —
  *
  * {{{
  * a.crossJoin(b).filter(size(array_intersect(ta, tb)) >= k)        // k ≥ 1
  * a.crossJoin(b).filter(inter / (size(ta)+size(tb)-inter) >= t)    // t > 0
  * }}}
  *
  * — plans as a cartesian nested loop (O(N²) at any cluster size). Both
  * predicates IMPLY at least one shared element (overlap ≥ k ≥ 1
  * directly; a ratio whose numerator is the intersection size can only
  * clear a positive threshold when the intersection is non-empty). So the
  * EXACT rewrite: explode each side's (deduplicated) element set,
  * equi-join on the element — null-safe, because `array_intersect` counts
  * a null present on both sides — and keep the ORIGINAL predicate as the
  * residual. Candidacy is lossless for any such conjunct; joins without
  * one are left untouched.
  *
  * NULL/empty arrays: the COUNT form is exact on every input in both null
  * modes and fires unconditionally; the RATIO form fires only when the
  * query's own conjuncts carry `size(arr) > 0`-style guards proving both
  * arrays non-null and non-empty — unguarded, a both-NULL pair passes the
  * original ratio under legacy sizeOfNull ((-1)/(-1) = 1.0) and a
  * both-empty pair throws DIVIDE_BY_ZERO under ANSI, neither of which the
  * exploded join can reproduce (see [[matchOverlap]] for the proof
  * obligations per form).
  *
  * Multiplicity: a pair can share several elements, so each side is
  * tagged with `monotonically_increasing_id()` below the explode and the
  * join is grouped back on the two ids (the same First-per-payload
  * construction as [[HammingJoinRule]]).
  *
  * Scale shape: the cartesian O(N²) becomes O(Σ_token df(token)²) — the
  * token equi-join hash-partitions across the cluster. A degenerate
  * stop-token (df ≈ N) degrades back to O(N²) pairs; the manual route for
  * adversarial frequency skew is the df-ordered PPJoin prefix filter
  * (SparkEntry.exactShinglePairs), which this rule deliberately does not
  * attempt — a rewrite must be semantics-preserving on every input, and
  * the prefix filter's global df ordering is a two-pass plan.
  *
  * Guards: Inner/Cross joins whose condition has NO equi-conjunct
  * (anything with an equality key already hash-partitions; the rewritten
  * join gains one, making the rule a fixpoint), array element type
  * atomic, each array expression referencing exactly one join side.
  * Injected by [[graft.functions.GraftExtensions]].
  */
object SetOverlapJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case j @ Join(left, right, Inner | Cross, Some(cond), _)
        if left.resolved && right.resolved =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hasEqui = conjuncts.exists {
        case EqualTo(l, r) => separable(l, r, left, right).isDefined
        case EqualNullSafe(l, r) => separable(l, r, left, right).isDefined
        case _ => false
      }
      // guard discovery must also consult the children's constraint sets:
      // PushDownPredicates moves one-sided `size(arr) > 0` conjuncts below
      // the join before this rule sees it, and a pushed guard re-surfaces
      // as a child constraint
      lazy val known = conjuncts ++ left.constraints.toSeq ++ right.constraints.toSeq
      val overlap =
        if (hasEqui) None
        else conjuncts.view.flatMap(matchOverlap(_, left, right, known)).headOption
      overlap match {
        case Some((ta, tb)) => rewrite(j, ta, tb)
        case None => j
      }
  }

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

  @scala.annotation.tailrec
  private def stripCast(e: Expression): Expression = e match {
    case c: Cast => stripCast(c.child)
    case _ => e
  }

  private object NumLit {
    def unapply(e: Expression): Option[Double] = e match {
      case Literal(v: Int, _) => Some(v.toDouble)
      case Literal(v: Long, _) => Some(v.toDouble)
      case Literal(v: Float, _) => Some(v.toDouble)
      case Literal(v: Double, _) => Some(v)
      case Literal(v: Decimal, _) => Some(v.toDouble)
      case _ => None
    }
  }

  /** The intersection-size expression at the root of `e` (casts stripped;
    * for a ratio, the numerator), as the separable (left, right) arrays
    * with an atomic element type, plus whether a Divide wraps it (the
    * Jaccard-ratio form, which needs the non-empty guards below).
    */
  private def intersectArrays(e: Expression, left: LogicalPlan,
                              right: LogicalPlan): Option[(Expression, Expression, Boolean)] =
    stripCast(e) match {
      case s: Size => s.child match {
        case ai: ArrayIntersect =>
          separable(ai.left, ai.right, left, right).filter { case (a, _) =>
            // join-key-safe element types only: no nested/map types, and no
            // floats (array_intersect's NaN/-0.0 handling differs from
            // join-key equality)
            a.dataType.asInstanceOf[ArrayType].elementType match {
              case StringType | BooleanType | ByteType | ShortType |
                   IntegerType | LongType | DateType | TimestampType |
                   _: DecimalType => true
              case _ => false
            }
          }.map { case (a, b) => (a, b, false) }
        case _ => None
      }
      case d: Divide =>
        // the denominator must be provably ≥ 1 on the guarded domain —
        // an arbitrary denominator (e.g. size(ta) - size(tb)) can be 0 on
        // a guard-passing DISJOINT pair, where the original plan throws
        // DIVIDE_BY_ZERO under ANSI but the exploded join would silently
        // drop the pair before the residual runs
        intersectArrays(d.left, left, right)
          .filter { case (a, b, _) => safeDenominator(d.right, a, b) }
          .map { case (a, b, _) => (a, b, true) }
      case _ => None
    }

  /** True when, GIVEN both arrays non-null and non-empty, `e` is provably
    * ≥ 1 — so a ratio over it can never divide by zero on any row of the
    * guarded domain: a positive literal, size of either array, the sum of
    * both sizes (Dice), least/greatest of the sizes (overlap
    * coefficient), or the union size |a|+|b|−|a∩b| (Jaccard; the
    * intersection counts distinct shared elements, so the union size is ≥
    * max(|a|,|b|) ≥ 1 even with duplicate elements). Casts stripped
    * throughout.
    */
  private def safeDenominator(e: Expression, ta: Expression, tb: Expression): Boolean = {
    def isSize(x: Expression): Boolean = stripCast(x) match {
      case s: Size => s.child.semanticEquals(ta) || s.child.semanticEquals(tb)
      case _ => false
    }
    def isInter(x: Expression): Boolean = stripCast(x) match {
      case s: Size => s.child match {
        case ai: ArrayIntersect =>
          (ai.left.semanticEquals(ta) && ai.right.semanticEquals(tb)) ||
            (ai.left.semanticEquals(tb) && ai.right.semanticEquals(ta))
        case _ => false
      }
      case _ => false
    }
    stripCast(e) match {
      case NumLit(v) => v > 0
      case s if isSize(s) => true
      case Add(x, y, _) => isSize(x) && isSize(y)
      case Subtract(add, z, _) => (stripCast(add) match {
        case Add(x, y, _) => isSize(x) && isSize(y)
        case _ => false
      }) && isInter(z)
      case l: Least => l.children.forall(isSize)
      case g: Greatest => g.children.forall(isSize)
      case _ => false
    }
  }

  /** True when `lo` bounds an integer-valued expression away from 0 and
    * from the legacy size(NULL) = -1 sentinel: `x > lo` with lo ≥ 0 or
    * `x ≥ lo` with lo > 0 both force x ≥ 1.
    */
  private def forcesPositive(lo: Double, strict: Boolean): Boolean =
    (strict && lo >= 0) || (!strict && lo > 0)

  /** True when some conjunct proves `arr` non-null AND non-empty in BOTH
    * null modes: a `size(arr) > lo` (lo ≥ 0) or `size(arr) ≥ lo` (lo > 0)
    * guard. size is an integer, and size(NULL) is -1 under legacy
    * sizeOfNull / NULL under ANSI — either fails the guard — so a row that
    * passes provably has a real element on that side.
    */
  private def provesNonEmpty(arr: Expression, conjuncts: Seq[Expression]): Boolean = {
    def sizeOfArr(x: Expression): Boolean = stripCast(x) match {
      case s: Size => s.child.semanticEquals(arr)
      case _ => false
    }
    conjuncts.exists {
      case GreaterThan(x, NumLit(lo)) => forcesPositive(lo, strict = true) && sizeOfArr(x)
      case GreaterThanOrEqual(x, NumLit(lo)) => forcesPositive(lo, strict = false) && sizeOfArr(x)
      case LessThan(NumLit(lo), x) => forcesPositive(lo, strict = true) && sizeOfArr(x)
      case LessThanOrEqual(NumLit(lo), x) => forcesPositive(lo, strict = false) && sizeOfArr(x)
      case _ => false
    }
  }

  /** Matches a conjunct whose truth implies size(array_intersect) ≥ 1:
    * `expr >= lo` with lo > 0, or `expr > lo` with lo ≥ 0, either operand
    * order, where expr is the (possibly cast/ratio-wrapped) intersection
    * size. The intersection size is a non-negative integer and a ratio of
    * it clears a positive bound only when it is non-zero.
    *
    * NULL/empty-array soundness (per-form):
    *  - COUNT form (`size(array_intersect) cmp k`): exact on every input
    *    in both null modes. A null array makes the intersection NULL, so
    *    size is -1 (legacy) or NULL (ANSI) — both fail the positive bound;
    *    an empty array gives 0 — also fails; and explode(outer=false)
    *    drops the same rows from the rewrite. No division exists, so ANSI
    *    cannot error. Fires unconditionally.
    *  - RATIO form (`size(array_intersect) / denom cmp t`): NOT exact
    *    unguarded — under legacy sizeOfNull a both-NULL pair evaluates
    *    (-1)/(-1) = 1.0 and PASSES the original predicate, and under ANSI
    *    a both-empty pair makes the original throw DIVIDE_BY_ZERO, while
    *    the rewrite would silently drop/succeed. So the ratio form fires
    *    ONLY when the query's own conjuncts prove BOTH arrays non-null and
    *    non-empty ([[provesNonEmpty]]) AND the denominator is one of the
    *    recognized shapes provably ≥ 1 on that domain
    *    ([[safeDenominator]] — Jaccard/Dice/overlap-coefficient forms); on
    *    that domain the rewrite is exact, rows violating a guard are
    *    dropped identically by both plans, and no division in the
    *    predicate can error.
    */
  private def matchOverlap(e: Expression, left: LogicalPlan, right: LogicalPlan,
                           known: Seq[Expression]): Option[(Expression, Expression)] = {
    def pos(x: Expression, lo: Double, strict: Boolean): Option[(Expression, Expression)] =
      if (forcesPositive(lo, strict))
        intersectArrays(x, left, right).collect {
          case (ta, tb, ratio)
              if !ratio ||
                (provesNonEmpty(ta, known) && provesNonEmpty(tb, known)) =>
            (ta, tb)
        }
      else None
    e match {
      case GreaterThanOrEqual(x, NumLit(lo)) => pos(x, lo, strict = false)
      case GreaterThan(x, NumLit(lo)) => pos(x, lo, strict = true)
      case LessThanOrEqual(NumLit(lo), x) => pos(x, lo, strict = false)
      case LessThan(NumLit(lo), x) => pos(x, lo, strict = true)
      case _ => None
    }
  }

  /** child → (plan with id + exploded distinct element, idAttr, keyAttr) */
  private def banded(child: LogicalPlan, arr: Expression,
                     tag: String): (LogicalPlan, Attribute, Attribute) = {
    val idAlias = Alias(MonotonicallyIncreasingID(), s"__graft_oj_id_$tag")()
    val withId = Project(child.output :+ idAlias, child)
    val at = arr.dataType.asInstanceOf[ArrayType]
    val keyAttr = AttributeReference(s"__graft_oj_key_$tag", at.elementType,
      nullable = at.containsNull)()
    val gen = Generate(Explode(ArrayDistinct(arr)), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(keyAttr), child = withId)
    (gen, idAlias.toAttribute, keyAttr)
  }

  private def rewrite(j: Join, ta: Expression, tb: Expression): LogicalPlan = {
    val (genL, idL, keyL) = banded(j.left, ta, "l")
    val (genR, idR, keyR) = banded(j.right, tb, "r")
    val joined = Join(genL, genR, Inner,
      Some(And(EqualNullSafe(keyL, keyR), j.condition.get)), j.hint)
    val aggCols = (idL :: idR :: Nil) ++ j.output.map { a =>
      Alias(First(a, ignoreNulls = false).toAggregateExpression(), a.name)(exprId = a.exprId)
    }
    Project(j.output, Aggregate(Seq(idL, idR), aggCols, joined))
  }
}
