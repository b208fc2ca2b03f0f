package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, IntegerType, ShortType}

/** Native Catalyst dot-product over two `array<double>` columns.
  *
  * Semantically identical to
  * `aggregate(zip_with(a, b, (x,y) => x*y), 0d, (acc,x) => acc+x)` — the
  * same strict left-to-right double summation, so results are bit-identical
  * to the HOF formulation and to the DuckDB oracle's `list_reduce` fold —
  * but compiled to a tight primitive loop via `doGenCode` instead of
  * per-element lambda evaluation with boxed arrays. On the all-pairs
  * similarity workloads this is the hot inner loop (O(pairs × dim)).
  *
  * Null contract: null if either array is null; elements are read as
  * primitives (embedding vectors carry no null elements).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // locals via freshName: a projection evaluating several DotProducts
      // (the composed-plane form) inlines them into one function body
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused dot-product of an `array<double>` query against an integer
  * SQ8 code vector (`array<int>` as [[graft.operators.Similarity
  * .quantizeInt8]] emits — int8-VALUED, int32-typed; parquet bitpacks
  * the narrow values regardless — with byte/short accepted too):
  * Σ qᵢ·codeᵢ with the code read directly as a primitive via the
  * element type's own accessor — NO intermediate dequantized array.
  * The SQ8 probe's former `transform(codes, c => c*scale)` allocated a
  * fresh double array per (candidate × query) row, which was the
  * measured 1.2× warm-node cost of the int8 path over float; the
  * caller applies the per-vector `scale` ONCE to the summed dot
  * instead (`scale·Σ qᵢ·codeᵢ` vs `Σ qᵢ·(codeᵢ·scale)` — same quantity
  * up to ulp re-association; the recall and probe-agreement gates are
  * threshold-based and hold).
  *
  * The accessor MUST match the element type: ArrayData.getByte on an
  * int-element array NPEs on the vectorized parquet path
  * ("byteData is null") and silently misreads on the unsafe-row path —
  * caught live at x100; the type dispatch below makes the mismatch
  * unrepresentable.
  */
case class DotProductIntCodes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot_i8"

  private lazy val elemType: DataType =
    right.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _),
          ArrayType(ByteType | ShortType | IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"graft_dot_i8 needs (array<double>, array<tinyint|" +
            s"smallint|int>), got ($l, $r)")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    elemType match {
      case ByteType =>
        while (i < n) { s += x.getDouble(i) * y.getByte(i); i += 1 }
      case ShortType =>
        while (i < n) { s += x.getDouble(i) * y.getShort(i); i += 1 }
      case _ =>
        while (i < n) { s += x.getDouble(i) * y.getInt(i); i += 1 }
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val getter = elemType match {
        case ByteType => "getByte"
        case ShortType => "getShort"
        case _ => "getInt"
      }
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * (double) $b.$getter($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Build the expression with inputs cast to array<double> (a no-op when
    * already double; exact widening from float).
    */
  def dot(a: Column, b: Column): Column = {
    def asDouble(c: Column): Expression =
      Cast(GraftBridge.expression(c), ArrayType(DoubleType))
    GraftBridge.column(DotProduct(asDouble(a), asDouble(b)))
  }

  /** Fused double×int-code dot: `a` cast to array<double>, `b` consumed
    * as its raw integral code array — zero per-row allocation. */
  def dotByte(a: Column, b: Column): Column = {
    val ad = Cast(GraftBridge.expression(a), ArrayType(DoubleType))
    GraftBridge.column(DotProductIntCodes(ad, GraftBridge.expression(b)))
  }
}
