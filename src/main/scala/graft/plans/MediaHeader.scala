package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType}

/** GRFT16: a real (if synthetic) fixed binary media container —
  * 16-byte big-endian header followed by the raw payload:
  *
  * {{{
  * offset  size  field
  *      0     4  magic "GRFT" (0x47 0x52 0x46 0x54)
  *      4     1  version (1)
  *      5     1  channels (u8)
  *      6     2  width  (u16)
  *      8     2  height (u16)
  *     10     4  n_frames (u32)
  *     14     2  reserved (0)
  *     16     …  payload bytes
  * }}}
  *
  * The pixel/sample codec itself is out of scope in this environment
  * (no media libraries — see [[graft.operators.Multimodal]] class doc);
  * the header parse is the part a Spark pipeline actually runs per row
  * at scale, and here it is a REAL vectorized decode: fixed-offset byte
  * reads compiled into the WholeStageCodegen loop via `doGenCode` — no
  * UDF serialization boundary, no per-row object allocation, strictly
  * tighter than a `mapInArrow` hop (which pays an Arrow batch
  * conversion at both edges; the Scala API has no `mapInArrow`, and
  * needs none: codegen is the stronger form of "batched").
  */
object MediaHeader {
  val HeaderLen = 16
  val Magic: Array[Byte] = Array[Byte](0x47, 0x52, 0x46, 0x54) // "GRFT"

  /** Decoded header fields: name -> (field id, data type). */
  val Fields: Map[String, (Int, DataType)] = Map(
    "version" -> (0, IntegerType),
    "channels" -> (1, IntegerType),
    "width" -> (2, IntegerType),
    "height" -> (3, IntegerType),
    "n_frames" -> (4, LongType),
    "payload_len" -> (5, LongType))

  /** `graft_media_field(bin, 'width')` as a Column. */
  def field(bin: Column, name: String): Column =
    GraftBridge.column(MediaHeaderField(GraftBridge.expression(bin), name))

  /** Frame a payload into a GRFT16 binary. Write-side helper (fixture
    * generation / ingest), so eval-only is acceptable; the read side is
    * the codegen'd hot path.
    */
  def encode(
      payload: Column,
      width: Column,
      height: Column,
      channels: Column,
      nFrames: Column): Column =
    GraftBridge.column(MediaHeaderEncode(
      GraftBridge.expression(payload),
      GraftBridge.expression(width),
      GraftBridge.expression(height),
      GraftBridge.expression(channels),
      GraftBridge.expression(nFrames)))
}

/** Fixed-offset header field read over a GRFT16 binary column.
  *
  * Null contract: null input, a binary shorter than the header, or a
  * magic mismatch all yield null — corrupt blobs surface as nulls to
  * filter on, never as exceptions mid-scan.
  */
case class MediaHeaderField(child: Expression, fieldName: String)
    extends UnaryExpression {

  private val (fieldId, fieldType) = MediaHeader.Fields.getOrElse(
    fieldName,
    throw new IllegalArgumentException(
      s"unknown GRFT16 field '$fieldName' " +
        s"(one of ${MediaHeader.Fields.keys.mkString(", ")})"))

  override def dataType: DataType = fieldType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_media_field"

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    if (b.length < MediaHeader.HeaderLen ||
      b(0) != 0x47 || b(1) != 0x52 || b(2) != 0x46 || b(3) != 0x54) null
    else fieldId match {
      case 0 => b(4) & 0xff
      case 1 => b(5) & 0xff
      case 2 => ((b(6) & 0xff) << 8) | (b(7) & 0xff)
      case 3 => ((b(8) & 0xff) << 8) | (b(9) & 0xff)
      case 4 => ((b(10) & 0xffL) << 24) | ((b(11) & 0xffL) << 16) |
        ((b(12) & 0xffL) << 8) | (b(13) & 0xffL)
      case 5 => (b.length - MediaHeader.HeaderLen).toLong
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val read = fieldId match {
        case 0 => s"($b[4] & 0xff)"
        case 1 => s"($b[5] & 0xff)"
        case 2 => s"((($b[6] & 0xff) << 8) | ($b[7] & 0xff))"
        case 3 => s"((($b[8] & 0xff) << 8) | ($b[9] & 0xff))"
        case 4 => s"(((long)($b[10] & 0xff) << 24) | ((long)($b[11] & 0xff) << 16) | " +
          s"((long)($b[12] & 0xff) << 8) | (long)($b[13] & 0xff))"
        case 5 => s"(long)($b.length - ${MediaHeader.HeaderLen})"
      }
      s"""
         |if ($b.length < ${MediaHeader.HeaderLen} ||
         |    $b[0] != 0x47 || $b[1] != 0x52 || $b[2] != 0x46 || $b[3] != 0x54) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $read;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Frame (payload, width, height, channels, nFrames) into a GRFT16
  * binary. Fully codegen'd like the decode side, so an encode→store or
  * an in-plan round trip never breaks the WholeStageCodegen span.
  * Out-of-range field values are masked to their field width (u16/u8/
  * u32) — identical truncation in eval and codegen.
  */
case class MediaHeaderEncode(
    payload: Expression,
    widthExpr: Expression,
    heightExpr: Expression,
    channelsExpr: Expression,
    nFramesExpr: Expression)
    extends Expression {

  override def children: Seq[Expression] =
    Seq(payload, widthExpr, heightExpr, channelsExpr, nFramesExpr)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_media_encode"

  override def eval(input: InternalRow): Any = {
    val p = payload.eval(input)
    val w = widthExpr.eval(input)
    val h = heightExpr.eval(input)
    val c = channelsExpr.eval(input)
    val f = nFramesExpr.eval(input)
    if (p == null || w == null || h == null || c == null || f == null) null
    else {
      val pb = p.asInstanceOf[Array[Byte]]
      val wi = w.asInstanceOf[Number].intValue()
      val hi = h.asInstanceOf[Number].intValue()
      val ci = c.asInstanceOf[Number].intValue()
      val fl = f.asInstanceOf[Number].longValue()
      val out = new Array[Byte](MediaHeader.HeaderLen + pb.length)
      System.arraycopy(MediaHeader.Magic, 0, out, 0, 4)
      out(4) = 1
      out(5) = ci.toByte
      out(6) = (wi >>> 8).toByte
      out(7) = wi.toByte
      out(8) = (hi >>> 8).toByte
      out(9) = hi.toByte
      out(10) = (fl >>> 24).toByte
      out(11) = (fl >>> 16).toByte
      out(12) = (fl >>> 8).toByte
      out(13) = fl.toByte
      System.arraycopy(pb, 0, out, MediaHeader.HeaderLen, pb.length)
      out
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val p = payload.genCode(ctx)
    val w = widthExpr.genCode(ctx)
    val h = heightExpr.genCode(ctx)
    val c = channelsExpr.genCode(ctx)
    val f = nFramesExpr.genCode(ctx)
    val pb = ctx.freshName("pb")
    val out = ctx.freshName("out")
    val code =
      code"""
        |${p.code}
        |${w.code}
        |${h.code}
        |${c.code}
        |${f.code}
        |boolean ${ev.isNull} = ${p.isNull} || ${w.isNull} || ${h.isNull} ||
        |  ${c.isNull} || ${f.isNull};
        |byte[] ${ev.value} = null;
        |if (!${ev.isNull}) {
        |  byte[] $pb = ${p.value};
        |  byte[] $out = new byte[${MediaHeader.HeaderLen} + $pb.length];
        |  $out[0] = 0x47; $out[1] = 0x52; $out[2] = 0x46; $out[3] = 0x54;
        |  $out[4] = 1;
        |  $out[5] = (byte) ${c.value};
        |  $out[6] = (byte) (((int) ${w.value}) >>> 8);
        |  $out[7] = (byte) ${w.value};
        |  $out[8] = (byte) (((int) ${h.value}) >>> 8);
        |  $out[9] = (byte) ${h.value};
        |  $out[10] = (byte) (((long) ${f.value}) >>> 24);
        |  $out[11] = (byte) (((long) ${f.value}) >>> 16);
        |  $out[12] = (byte) (((long) ${f.value}) >>> 8);
        |  $out[13] = (byte) ${f.value};
        |  System.arraycopy($pb, 0, $out, ${MediaHeader.HeaderLen}, $pb.length);
        |  ${ev.value} = $out;
        |}
       """.stripMargin
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(payload = newChildren(0), widthExpr = newChildren(1),
      heightExpr = newChildren(2), channelsExpr = newChildren(3),
      nFramesExpr = newChildren(4))
}
