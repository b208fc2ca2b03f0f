package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and implement decode /
  * feature-extract / frame-sample as distributed column operators.
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode step is a clearly-marked DETERMINISTIC STUB: it derives fake
  * (width, height, channels, frame count) metadata from the payload's
  * leading bytes. Everything around the stub — the binary schema, the
  * per-row metadata extraction, the frame-index explosion, partitioning —
  * is real Spark plumbing that a real codec UDF would drop into (e.g. a
  * `mapInArrow`/`mapPartitions` batch decode at the marked point).
  */
object Multimodal {

  /** Attach an opaque binary payload column (here: the utf-8 bytes of the
    * text column, standing in for image/audio bytes).
    */
  def withBinaryPayload(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("payload", encode(col(textCol), "UTF-8"))

  /** STUB DECODER: deterministic fake media metadata from payload bytes.
    * b0/b1 are the first two bytes (the "header"); a real implementation
    * would replace this expression block with a codec call over the binary
    * column (batched via mapPartitions/mapInArrow) — the output schema and
    * everything downstream stays identical.
    */
  def decodeMetadata(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val nBytes = octet_length(t)
    val b0 = ascii(substring(t, 1, 1))
    val b1 = ascii(substring(t, 2, 1))
    docs.select(
      col(idCol).as("doc_id"),
      nBytes.as("n_bytes"),
      (lit(32) + (b0 % 8) * 16).as("width"),
      (lit(32) + (b1 % 8) * 16).as("height"),
      (lit(1) + (b0 + b1) % 3).as("channels"),
      (lit(1) + floor(nBytes / lit(128)).cast("long")).as("n_frames"))
  }

  /** Feature extraction stub: a 16-bin byte histogram over the payload —
    * the shape of a real embedding/feature extractor (fixed-length numeric
    * vector per media object), computed with exact integer counts so the
    * oracle verifies the plumbing end to end.
    */
  def byteHistogram(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val codes = flatten(transform(array(t), s =>
      transform(sequence(lit(1), length(s)), i => ascii(s.substr(i, lit(1))))))
    // materialize codes and hist as ATTRIBUTES between projections: the
    // 16 per-bin filters each reference `codes`, and the 16 output
    // columns each reference `hist` — as inline expression trees those
    // re-evaluated the whole chain 16×16 ≈ 256 times per row (the
    // get-in-lambda recompute class); as column attributes each level
    // evaluates exactly once
    val hist = transform(sequence(lit(0), lit(15)),
      b => size(filter(col("__codes"), c => floor(c / 16).cast("int") === b)))
    docs
      .withColumn("__codes", codes)
      .withColumn("__hist", hist)
      .select(
        (col(idCol).as("doc_id") +:
          (0 until 16).map(b => get(col("__hist"), lit(b)).as(s"h$b"))): _*)
  }

  /** Case class for the batch-decoded metadata rows. */
  case class MediaMeta(
      doc_id: Long, n_bytes: Int, width: Int, height: Int,
      channels: Int, n_frames: Long)

  /** The same stub decode as [[decodeMetadata]] but through the REAL
    * batch-decode plumbing a production codec uses: `mapPartitions` over
    * the opaque binary payload, decoding a whole partition per task (this
    * is where an image/audio library call would batch). Output is
    * bit-identical to the expression path — the two formulations are
    * cross-checked against the same oracle.
    */
  def decodeMetadataBatch(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    withBinaryPayload(docs, textCol)
      .select(col(idCol).as("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          // >>> STUB DECODE: replace this block with the codec call <<<
          // mirror the expression path exactly: ascii(substring(s, i, 1))
          // is the first UTF-16 unit of the i-th CHARACTER (0 when the
          // string is too short) — not a raw byte, so short and non-ASCII
          // payloads agree between the two formulations
          val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
          val b0 = if (s.length >= 1) s.charAt(0).toInt else 0
          val b1 = if (s.length >= 2) s.charAt(1).toInt else 0
          MediaMeta(
            doc_id = id,
            n_bytes = bytes.length,
            width = 32 + (b0 % 8) * 16,
            height = 32 + (b1 % 8) * 16,
            channels = 1 + (b0 + b1) % 3,
            n_frames = 1L + bytes.length / 128)
        }
      }
      .toDF()
  }

  /** Frame each document's bytes into a REAL binary container
    * ([[graft.plans.MediaHeader]] GRFT16: magic + version + channels +
    * width + height + frame count, then the payload) with
    * deterministically derived metadata, so the round trip is
    * oracle-checkable: width/height/channels/frames are functions of
    * `doc_id` and the byte length that DuckDB recomputes directly.
    */
  def withFormatPayload(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(idCol)
    val nBytes = octet_length(col(textCol))
    docs.withColumn("payload", graft.plans.MediaHeader.encode(
      encode(col(textCol), "UTF-8"),
      (lit(32) + pmod(id, lit(8)) * 16).cast("int"),
      (lit(32) + pmod(floor(id / 8), lit(8)).cast("int") * 16).cast("int"),
      (lit(1) + pmod(id, lit(3))).cast("int"),
      lit(1L) + floor(nBytes / lit(128)).cast("long")))
  }

  /** Decode GRFT16 headers from a binary column — the genuinely
    * vectorized decode path: each field is a fixed-offset byte read
    * compiled into the scan's WholeStageCodegen loop
    * ([[graft.plans.MediaHeaderField]] `doGenCode`), so a billion-blob
    * metadata pass is one codegen stage with zero serialization
    * boundaries (PlanSpec gates the plan shape). Corrupt blobs (bad
    * magic / truncated header) decode to nulls, never exceptions.
    */
  def decodeHeaders(docs: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    import graft.plans.MediaHeader.field
    val p = col(payloadCol)
    docs.select(
      col(idCol).as("doc_id"),
      field(p, "version").as("version"),
      field(p, "width").as("width"),
      field(p, "height").as("height"),
      field(p, "channels").as("channels"),
      field(p, "n_frames").as("n_frames"),
      field(p, "payload_len").as("payload_len"))
  }

  /** Fit-box resize planning: the aspect-ratio-preserving output dims for
    * a (targetW, targetH) box — `scale = min(tw/w, th/h)` computed with
    * exact integer cross-multiplication, so it is deterministic and
    * oracle-expressible. This is the metadata half of a resize operator;
    * the pixel half is the codec stub (see class doc) and would slot into
    * the same batch-decode plumbing as [[decodeMetadataBatch]].
    */
  def resizePlan(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      targetW: Int,
      targetH: Int): DataFrame = {
    val w = col("width")
    val h = col("height")
    val widthBinds = lit(targetW) * h <= lit(targetH) * w
    decodeMetadata(docs, idCol, textCol)
      .select(
        col("doc_id"), w, h,
        when(widthBinds, lit(targetW))
          .otherwise(floor(w * targetH / h).cast("int")).as("out_w"),
        when(widthBinds, floor(h * targetW / w).cast("int"))
          .otherwise(lit(targetH)).as("out_h"))
  }

  /** Frame sampling: one row per sampled frame index with its byte offset —
    * the explode pattern a video pipeline uses to fan decoded frames out to
    * executors. `frame_idx` steps by `stride`.
    */
  def sampleFrames(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      stride: Int = 1): DataFrame =
    decodeMetadata(docs, idCol, textCol)
      .select(
        col("doc_id"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong)))
          .as("frame_idx"))
      .withColumn("byte_offset", col("frame_idx") * 128)
}
