package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Adapter from Spark's Kafka source wire shape to engine sample rows.
  *
  * `spark.readStream.format("kafka")` (and its batch twin) always emits
  * the fixed seven-column schema pinned in [[wireSchema]] — this object
  * is the single place that shape is interpreted, so a deployment with
  * the `spark-sql-kafka` connector on the classpath plugs a real topic
  * into [[graft.streaming.Ingest]] by composing
  * `Ingest.ingestStream(tsdb, KafkaShaped.samples(kafkaDf), …)` with no
  * other engine change. (The connector jar itself is not bundled here;
  * the contract is spec-gated with memory-stream frames of the exact
  * wire schema — StreamingSpec "kafka-shaped source".)
  *
  * Contract, column by column:
  *  - `value` (BINARY, required): UTF-8 JSON
  *    `{"metric": str, "labels": {str: str}, "ts": long-epoch-seconds,
  *    "value": double}` — `metric` and `value` are mandatory, `labels`
  *    defaults to empty, `ts` defaults to the broker `timestamp`.
  *  - `timestamp` (TIMESTAMP): the broker append time; used ONLY as the
  *    event-time fallback when the payload carries no `ts` (a pipeline
  *    that trusts broker time simply omits `ts`).
  *  - `key` (BINARY, nullable): the producer's partitioning hint.
  *    Deliberately ignored for semantics — the engine re-derives series
  *    identity from (metric, labels) ([[graft.Tsdb]] sid), so a
  *    mis-keyed producer cannot corrupt series assignment.
  *  - `partition`, `offset`, `topic`, `timestampType`: transport
  *    lineage. Ignored for semantics; partition skew is absorbed by the
  *    engine's ingest spread defense (Tsdb.insertRows repartitions
  *    narrow feeds), so a single hot Kafka partition cannot serialize
  *    the write path.
  *
  * Malformed payloads (unparseable JSON, missing `metric`/`value`) fail
  * the batch loudly by default — at-least-once redelivery means a
  * silent drop would lose data forever with no signal; pass
  * `onMalformed = "drop"` to shed them instead (dead-letter the topic
  * upstream).
  */
object KafkaShaped {

  /** The Kafka source's fixed output schema (Spark's kafka-0-10-sql
    * connector contract). */
  val wireSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** The JSON payload carried in `value`. */
  val payloadSchema: StructType = StructType(Seq(
    StructField("metric", StringType),
    StructField("labels", MapType(StringType, StringType)),
    StructField("ts", LongType),
    StructField("value", DoubleType)))

  /** Parse a Kafka-wire-shaped frame into `(metric, labels, ts, value)`
    * sample rows — the engine's ingest schema. Pure column expressions
    * (from_json + coalesce), so the parse stays inside whole-stage
    * codegen and composes with any downstream streaming operator.
    */
  def samples(df: DataFrame, onMalformed: String = "fail"): DataFrame = {
    require(Set("fail", "drop")(onMalformed),
      s"onMalformed must be 'fail' or 'drop', got: $onMalformed")
    val p = from_json(col("value").cast("string"), payloadSchema)
    val parsed = df
      .withColumn("__p", p)
      .withColumn("__ok",
        col("__p").isNotNull && col("__p.metric").isNotNull &&
          col("__p.value").isNotNull)
    val checked =
      if (onMalformed == "drop") parsed.where(col("__ok"))
      else parsed.withColumn("__p",
        when(col("__ok"), col("__p")).otherwise(raise_error(concat(
          lit("kafka-shaped payload is not a sample (need metric + " +
            "value JSON fields): "),
          coalesce(col("value").cast("string"), lit("<null>"))))))
    checked.select(
      col("__p.metric").as("metric"),
      coalesce(col("__p.labels"),
        map().cast(MapType(StringType, StringType))).as("labels"),
      coalesce(col("__p.ts"),
        col("timestamp").cast("long")).as("ts"),
      col("__p.value").as("value"))
  }
}
