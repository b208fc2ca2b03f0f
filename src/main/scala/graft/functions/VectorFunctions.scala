package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` / `array<double>` embedding columns.
  *
  * All reductions are strict left-to-right sequential folds
  * (`aggregate(zip_with(...))`), NOT parallel tree reductions. That makes the
  * float arithmetic bit-reproducible across engines that fold in list order
  * (the DuckDB oracle mirrors the same fold), so similarity thresholds and
  * top-k ranks compare exactly. Inputs are cast to double first — float
  * widening is exact — and all arithmetic happens in double.
  *
  * These are codegen'd builtin higher-order functions: no UDF, no
  * serialization boundary, safe inside WholeStageCodegen.
  */
object VectorFunctions {

  def toDoubleArray(a: Column): Column = transform(a, _.cast("double"))

  /** Sequential dot product: ((0 + a1*b1) + a2*b2) + ...
    * Delegates to the native codegen'd [[graft.plans.DotProduct]] — the
    * same left-to-right double fold as
    * `aggregate(zip_with(a, b, _*_), 0d, _+_)`, compiled to a primitive
    * loop (the HOF form allocates per element; this is the hot inner loop
    * of the O(pairs × dim) similarity operators).
    */
  def dotSeq(a: Column, b: Column): Column = graft.plans.DotProduct.dot(a, b)

  def normSeq(a: Column): Column = sqrt(dotSeq(a, a))

  /** Cosine similarity, computed as dot/(|a|*|b|) in double. */
  def cosineSeq(a: Column, b: Column): Column =
    dotSeq(a, b) / (normSeq(a) * normSeq(b))

  /** Cosine rounded to 6 dp — the comparison/ranking form used by the
    * oracled queries (rounding removes any residual last-ulp risk).
    */
  def cosineRounded(a: Column, b: Column): Column =
    round(cosineSeq(a, b), 6)
}
