package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature: `sig[i] = min over tokens of h_i(tok)` with
  * the hash family `h_i(tok) = xxhash64(xxhash64(tok), i)` — bit-identical
  * to the SQL formulation
  * `min(xxhash64(xxhash64(tok), i))` over exploded tokens (both reduce to
  * `XXH64.hashInt(i, XXH64.hashLong(XXH64.hashUTF8String(tok, 42), 42))`),
  * but computed per row in one pass over the token array.
  *
  * Why it exists: the explode + 128-parallel-`min` groupBy formulation
  * shuffles the whole exploded corpus to re-assemble per-doc signatures —
  * at 100 TB that is a corpus-sized shuffle for what is logically a
  * per-row map. This expression keeps the signature step inside the scan
  * stage: no explode, no shuffle, one `tokens × numHashes` primitive loop
  * (with the outer string hash computed once per token).
  *
  * Empty arrays yield `Long.MaxValue` signatures (callers filter empty
  * shingle sets first, matching the groupBy form which emits no row).
  * Null array → null.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0 && numHashes <= 4096)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var t = 0
    while (t < n) {
      val base = XXH64.hashLong(
        XXH64.hashUTF8String(arr.getUTF8String(t), 42L), 42L)
      var i = 0
      while (i < numHashes) {
        val h = XXH64.hashInt(i, base)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      t += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      // locals via freshName so duplicate instances inline safely
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val t = ctx.freshName("t")
      val base = ctx.freshName("base")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |int $n = $a.numElements();
         |long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $t = 0; $t < $n; $t++) {
         |  long $base = $xxh.hashLong(
         |    $xxh.hashUTF8String($a.getUTF8String($t), 42L), 42L);
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    long $h = $xxh.hashInt($i, $base);
         |    if ($h < $sig[$i]) $sig[$i] = $h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  /** MinHash signature array of a token-array column. */
  def signature(tokens: Column, numHashes: Int): Column =
    GraftBridge.column(MinHashSignature(
      GraftBridge.expression(tokens), numHashes))
}
