package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.Gorilla

/** Per-series Gorilla block packing as a typed Aggregator: collects a
  * series' (ts, value) points and emits the bit-packed block — the
  * engine-side equivalent of the reference's per-series compressed block
  * build at flush time (capability O20/O16). Buffer size is bounded by the
  * points-per-series-per-segment, which the segment duration bounds by
  * design (the same invariant the reference relies on).
  */
class GorillaAggregator
    extends Aggregator[(Long, Double), Seq[(Long, Double)], Array[Byte]] {
  override def zero: Seq[(Long, Double)] = List.empty
  // O(1) prepend per point (finish sorts once); an append here would make
  // buffer accumulation quadratic in points-per-series
  override def reduce(b: Seq[(Long, Double)], a: (Long, Double)): Seq[(Long, Double)] =
    a +: b
  override def merge(b1: Seq[(Long, Double)], b2: Seq[(Long, Double)]): Seq[(Long, Double)] =
    b1 ++ b2
  override def finish(r: Seq[(Long, Double)]): Array[Byte] =
    Gorilla.encode(r.sorted)
  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Double)]]()
  override def outputEncoder: Encoder[Array[Byte]] =
    ExpressionEncoder[Array[Byte]]()
}

object GorillaPack {

  /** Pack each group's points into one Gorilla block; returns
    * (groupCol, n_points, n_bytes, block).
    */
  def packPerSeries(
      df: DataFrame, // columns: group, ts, value
      groupCol: String,
      tsCol: String,
      valueCol: String): DataFrame = {
    val pack = udaf(new GorillaAggregator)
    df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_points"),
        pack(col(tsCol), col(valueCol)).as("block"))
      .withColumn("n_bytes", octet_length(col("block")))
  }

  /** Decode-side table function: explode each packed block back into its
    * ts-sorted (ts, value) points — the segment-load/scan direction of the
    * reference's per-series blocks (disk_segment.go iterators). Distributed
    * flatMap: one task decodes many blocks, no driver involvement. Group
    * keys are long (the engine's sid/user-id shape).
    */
  def unpackToPoints(
      packed: DataFrame, // columns: group (long), block (binary)
      groupCol: String,
      blockCol: String,
      tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    val spark = packed.sparkSession
    import spark.implicits._
    packed
      .select(col(groupCol).cast("long"), col(blockCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (g, block) =>
        Gorilla.decode(block).map { case (ts, v) => (g, ts, v) }
      }
      .toDF(groupCol, tsCol, valueCol)
  }
}
