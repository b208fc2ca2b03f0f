package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The per-row BPE segmenter behind [[BpeEncode]]: whitespace-split the
  * document (the engine's wsTokens convention — trim + `\s+`, empty
  * words dropped), encode each word with [[graft.functions.Bpe]]'s
  * Sennrich apply, and flatten the subword tokens in document order.
  * Ships into the generated code as a reference object so the (tiny)
  * merge table is resolved once per task, not per row.
  */
final class BpeCodec(val merges: Array[(String, String)])
    extends Serializable {
  def encodeDoc(text: UTF8String): ArrayData = {
    val words = text.toString.trim.split("\\s+")
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var w = 0
    while (w < words.length) {
      val word = words(w)
      if (word.nonEmpty) {
        val toks = graft.functions.Bpe.encodeWord(word, merges)
        var i = 0
        while (i < toks.length) {
          out += UTF8String.fromString(toks(i))
          i += 1
        }
      }
      w += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Native BPE document encoder: `text → array<string>` of subword tokens
  * under a FIXED merge table (the shipped-tokenizer shape — training is
  * [[graft.operators.TextAnalysis.bpeTrain]]'s census + driver pass).
  * The whole segmentation happens inside the scan stage — no explode,
  * no join, no shuffle; the generated code calls into [[BpeCodec]] (the
  * same referenced-kernel pattern Spark's own regexp expressions use —
  * the per-word merge loop is algorithmic, not expressible as inline
  * arithmetic). Null text → null. Cost is `numMerges × docLength`
  * (each merge is one linear pass per word): linear in document length,
  * LinearitySpec-gated.
  */
case class BpeEncode(child: Expression, codec: BpeCodec)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_bpe_encode"

  override def nullSafeEval(v: Any): Any =
    codec.encodeDoc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("bpeCodec", codec,
        classOf[BpeCodec].getName)
      s"${ev.value} = $ref.encodeDoc($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncode {
  def encode(text: Column, merges: Seq[(String, String)]): Column =
    GraftBridge.column(
      BpeEncode(GraftBridge.expression(text), new BpeCodec(merges.toArray)))
}
