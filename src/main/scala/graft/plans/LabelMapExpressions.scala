package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapBuilder, MapData}
import org.apache.spark.sql.types.{DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused label-set normalization:
  *
  *   FoldNormalizeLabels(labels, metric)
  *     == map_concat(map_filter(coalesce(labels, map()),
  *          (k,v) => k IS NOT NULL AND v IS NOT NULL AND k != '' AND v != ''),
  *          map('__name__', metric))            (under LAST_WIN)
  *
  * in ONE pass per row. The higher-order map functions are
  * CodegenFallback (interpreted per-entry lambda dispatch) and excluded
  * from codegen subexpression elimination, so the 3-node chain was the
  * dominant per-row cost of every tsdb query's scan-stage Project
  * (~100 queries build this map for every surviving sample). This
  * expression participates in whole-stage codegen: the generated code is
  * a primitive loop over the map's key/value arrays feeding the same
  * [[ArrayBasedMapBuilder]] the built-in map_concat uses, so the dedup
  * semantics (LAST_WIN replaces the value at the FIRST occurrence's
  * position; EXCEPTION policy throws) are inherited, not reimplemented.
  *
  * Exactness contract (vs the chain above, entry-for-entry including
  * output order): entries stream through the builder in map order after
  * the null/empty filter; the `__name__` -> metric entry goes last, so a
  * surviving user-supplied `__name__` label is overwritten in place and
  * a null metric yields a null-valued `__name__` entry — byte-identical
  * to map_concat under the session dedup policy. A NULL labels map folds
  * like the empty map (the coalesce). Result is never null.
  */
case class FoldNormalizeLabels(left: Expression, right: Expression)
    extends BinaryExpression {

  private def labels: Expression = left
  private def metric: Expression = right

  override def prettyName: String = "graft_fold_labels"

  override def nullable: Boolean = false

  // valueContainsNull = true mirrors the replaced chain: its coalesce
  // widened against `cast(map() as map<string,string>)`, whose parsed
  // value type is nullable — keeping the schema byte-identical matters
  // for the oracle's schema gate
  override def dataType: DataType =
    MapType(StringType, StringType, valueContainsNull = true)

  override def checkInputDataTypes(): TypeCheckResult =
    (labels.dataType, metric.dataType) match {
      case (MapType(StringType, StringType, _), StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, m) => TypeCheckResult.TypeCheckFailure(
        s"graft_fold_labels needs (map<string,string>, string), got ($l, $m)")
    }

  @transient private lazy val builder =
    new ArrayBasedMapBuilder(StringType, StringType)

  private val nameLit = UTF8String.fromString(
    graft.functions.LabelFunctions.MetricLabel)

  override def eval(input: InternalRow): Any = {
    val m = labels.eval(input).asInstanceOf[MapData]
    if (m != null) {
      val ka = m.keyArray(); val va = m.valueArray()
      val n = m.numElements()
      var i = 0
      while (i < n) {
        if (!ka.isNullAt(i) && !va.isNullAt(i)) {
          val k = ka.getUTF8String(i); val v = va.getUTF8String(i)
          if (k.numBytes > 0 && v.numBytes > 0) builder.put(k, v)
        }
        i += 1
      }
    }
    builder.put(nameLit, metric.eval(input))
    builder.build()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val builderTerm = ctx.addReferenceObj("mapBuilder", builder)
    val nameTerm = ctx.addReferenceObj("nameLit", nameLit)
    val labelsGen = labels.genCode(ctx)
    val metricGen = metric.genCode(ctx)
    val ka = ctx.freshName("ka")
    val va = ctx.freshName("va")
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val k = ctx.freshName("k")
    val v = ctx.freshName("v")
    val arrData = "org.apache.spark.sql.catalyst.util.ArrayData"
    val utf8 = "org.apache.spark.unsafe.types.UTF8String"
    val resultCode =
      code"""
        |${labelsGen.code}
        |${metricGen.code}
        |if (!${labelsGen.isNull}) {
        |  $arrData $ka = ${labelsGen.value}.keyArray();
        |  $arrData $va = ${labelsGen.value}.valueArray();
        |  int $n = ${labelsGen.value}.numElements();
        |  for (int $i = 0; $i < $n; $i++) {
        |    if (!$ka.isNullAt($i) && !$va.isNullAt($i)) {
        |      $utf8 $k = $ka.getUTF8String($i);
        |      $utf8 $v = $va.getUTF8String($i);
        |      if ($k.numBytes() > 0 && $v.numBytes() > 0) {
        |        $builderTerm.put($k, $v);
        |      }
        |    }
        |  }
        |}
        |$builderTerm.put($nameTerm,
        |  ${metricGen.isNull} ? null : (Object) ${metricGen.value});
        |org.apache.spark.sql.catalyst.util.MapData ${ev.value} =
        |  $builderTerm.build();
        |""".stripMargin
    ev.copy(code = resultCode,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused canonical `k=v,k=v` label rendering (name-sorted):
  *
  *   CanonicalLabelsRender(labels)
  *     == concat_ws(",", transform(sort_array(map_entries(labels)),
  *          e => concat_ws("=", e.key, e.value)))
  *
  * `transform` is an interpreted higher-order function; this runs the
  * sort + render as one compiled pass (called per row by sidOf in the
  * normalize Project of every tsdb query). Exactness: entries sort by
  * (key, value) with the same binary UTF8String order and asc null
  * ordering sort_array uses; concat_ws's null-skipping is mirrored by
  * UTF8String.concatWs (a null key or value renders the other side
  * alone, never the string "null"); a NULL map renders as "" exactly
  * like concat_ws over a null transform result. Result is never null.
  */
case class CanonicalLabelsRender(child: Expression)
    extends UnaryExpression {

  override def prettyName: String = "graft_canonical_labels"

  override def nullable: Boolean = false

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case MapType(StringType, StringType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_canonical_labels needs map<string,string>, got $t")
    }

  override def eval(input: InternalRow): Any =
    CanonicalLabelsRender.render(child.eval(input).asInstanceOf[MapData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val resultCode =
      code"""
        |${childGen.code}
        |org.apache.spark.unsafe.types.UTF8String ${ev.value} =
        |  graft.plans.CanonicalLabelsRender.render(
        |    ${childGen.isNull} ? null : ${childGen.value});
        |""".stripMargin
    ev.copy(code = resultCode,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CanonicalLabelsRender {
  private val Comma = UTF8String.fromString(",")
  private val Eq = UTF8String.fromString("=")

  /** Static kernel shared by eval and generated code. */
  def render(m: MapData): UTF8String = {
    if (m == null) return UTF8String.EMPTY_UTF8
    val n = m.numElements()
    if (n == 0) return UTF8String.EMPTY_UTF8
    val ka = m.keyArray(); val va = m.valueArray()
    val idx = Array.range(0, n)
    val keys = new Array[UTF8String](n)
    val vals = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      keys(i) = if (ka.isNullAt(i)) null else ka.getUTF8String(i)
      vals(i) = if (va.isNullAt(i)) null else va.getUTF8String(i)
      i += 1
    }
    // (key, value) asc with nulls first — sort_array's struct ordering
    def lt(a: Int, b: Int): Boolean = {
      val c = cmp(keys(a), keys(b))
      if (c != 0) c < 0 else cmp(vals(a), vals(b)) < 0
    }
    def cmp(x: UTF8String, y: UTF8String): Int =
      if (x eq null) { if (y eq null) 0 else -1 }
      else if (y eq null) 1
      else x.compareTo(y)
    // insertion sort: label sets are tiny (2-4 entries) and already
    // nearly sorted; avoids the boxing a sortBy would pay per row
    i = 1
    while (i < n) {
      val x = idx(i)
      var j = i - 1
      while (j >= 0 && lt(x, idx(j))) { idx(j + 1) = idx(j); j -= 1 }
      idx(j + 1) = x
      i += 1
    }
    val rendered = new Array[UTF8String](n)
    i = 0
    while (i < n) {
      rendered(i) = UTF8String.concatWs(Eq, keys(idx(i)), vals(idx(i)))
      i += 1
    }
    UTF8String.concatWs(Comma, rendered: _*)
  }

  def render(labels: Column): Column =
    GraftBridge.column(CanonicalLabelsRender(GraftBridge.expression(labels)))
}

object FoldNormalizeLabels {
  /** Column builder: the fused normalize+fold (see class doc). */
  def fold(metric: Column, labels: Column): Column =
    GraftBridge.column(FoldNormalizeLabels(
      GraftBridge.expression(labels), GraftBridge.expression(metric)))
}

/** Optimizer rule: simplify `labels[k]` lookups over a FoldNormalizeLabels
  * of a LITERAL-KEYED CreateMap to the key's value expression — the
  * plain-column matcher fast path (r15's `__name__`-only
  * factMatcherPredicate) generalized to EVERY label and EVERY lookup
  * site. After predicate pushdown substitutes the normalize Project's
  * alias, tsdb Filter conjuncts and grouping keys read
  * `GetMapValue(fold(map('user_id', …, 'cohort', …), metric), 'cohort')`;
  * this rule folds that to the (codegen'd, scan-stage) value expression,
  * and column pruning then drops the map construction entirely from
  * queries that never output `labels` itself.
  *
  * Exactness, case by case against the fold's runtime semantics:
  *  - k = `__name__`: the fold appends (`__name__` → metric) LAST under
  *    LAST_WIN, so the lookup is `metric` verbatim (null metric gives a
  *    null-valued entry — lookup null — identical).
  *  - k among the literal keys (last occurrence wins, mirroring the
  *    CreateMap dedup): the entry survives the fold's filter iff its
  *    value is non-null and non-empty, so the lookup is
  *    `If(v IS NOT NULL AND v != '', v, NULL)`.
  *  - k absent from the literal keys (or empty — empty keys are
  *    filtered): NULL.
  * The rule bails on non-literal or null-literal keys (a dynamic key
  * could shadow the match / a null key throws at runtime) and on
  * non-deterministic value/metric expressions (inlining would change
  * evaluation counts). Registered per-session via
  * `experimental.extraOptimizations` by the Tsdb constructor — no
  * session-builder cooperation needed.
  */
object SimplifyFoldedLabelLookup
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  private val Name =
    UTF8String.fromString(graft.functions.LabelFunctions.MetricLabel)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case g @ GetMapValue(FoldNormalizeLabels(cm: CreateMap, metric),
          Literal(k: UTF8String, StringType)) if k != null =>
        rewrite(cm, metric, k).getOrElse(g)
    }

  private def rewrite(cm: CreateMap, metric: Expression,
      k: UTF8String): Option[Expression] = {
    if (k.equals(Name)) {
      return if (metric.deterministic) Some(metric) else None
    }
    val n = cm.children.length / 2
    val keyLits: Seq[Option[UTF8String]] =
      (0 until n).map(i => cm.children(2 * i) match {
        case Literal(s: UTF8String, StringType) if s != null => Some(s)
        case _ => None
      })
    if (keyLits.exists(_.isEmpty)) return None
    val nullLit = Literal(null, StringType)
    if (k.numBytes == 0) return Some(nullLit)
    val idx = keyLits.lastIndexWhere(_.exists(_.equals(k)))
    if (idx < 0) return Some(nullLit)
    val v = cm.children(2 * idx + 1)
    if (!v.deterministic) return None
    val empty = Literal(UTF8String.fromString(""), StringType)
    Some(If(And(IsNotNull(v), Not(EqualTo(v, empty))), v, nullLit))
  }
}
