package graft.plans

import org.apache.spark.sql.{Column, Encoder, Encoders, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Bloom-filter membership over shingle sets — the huge-benchmark scale
  * path for decontamination.
  *
  * The exact-join decontamination broadcasts the benchmark's distinct
  * shingles; that caps the benchmark at broadcast size (strings are
  * ~30 bytes each). A Bloom filter at 1% fpp spends ~9.6 BITS per
  * shingle — ~25× smaller — and has NO false negatives, so it works as
  * a map-side prefilter whose misses are final and whose hits are
  * verified by an exact (shuffle) join over only the candidate docs.
  * The corpus never broadcasts, the benchmark never broadcasts, and the
  * exchange input shrinks from every doc's shingles to the candidates'.
  *
  * Layout: `bits` is an `Array[Long]` bitset of `64·words` bits; each
  * shingle sets/checks `numHashes` positions via Kirsch–Mitzenmacher
  * double hashing `h1 + i·h2` with
  * `h1 = xxhash64(tok, seed=42)` and `h2 = xxhash64(h1, seed=7)` — the
  * same `XXH64.hashUTF8String` the MinHash expression uses, identical
  * in the aggregator (build) and the expression (probe).
  */
object BloomShingles {

  /** Standard sizing: bits m = -n·ln(p)/ln(2)², hashes k = (m/n)·ln(2). */
  def plan(expectedItems: Long, fpp: Double): (Int, Int) = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1)
    val m = math.ceil(
      -expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val words = math.max(1L, (m + 63) / 64)
    require(words <= Int.MaxValue / 8, s"bloom too large: $words words")
    val k = math.max(1, math.round(m.toDouble / expectedItems * math.log(2)).toInt)
    (words.toInt, math.min(k, 16))
  }

  private[plans] def hash1(tok: UTF8String): Long =
    XXH64.hashUTF8String(tok, 42L)

  private[graft] def setBits(bits: Array[Long], tok: UTF8String, numHashes: Int): Unit = {
    val m = bits.length.toLong * 64L
    val h1 = hash1(tok)
    val h2 = XXH64.hashLong(h1, 7L)
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, m)
      bits((pos >>> 6).toInt) |= (1L << (pos & 63L))
      i += 1
    }
  }

  private[graft] def testBits(bits: Array[Long], tok: UTF8String, numHashes: Int): Boolean = {
    val m = bits.length.toLong * 64L
    val h1 = hash1(tok)
    val h2 = XXH64.hashLong(h1, 7L)
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, m)
      if ((bits((pos >>> 6).toInt) & (1L << (pos & 63L))) == 0L) return false
      i += 1
    }
    true
  }

  /** `true` iff ANY shingle in the array is (probably) in the filter. */
  def anyContain(shingles: Column, bits: Array[Long], numHashes: Int): Column =
    GraftBridge.column(
      BloomAnyContain(GraftBridge.expression(shingles), bits, numHashes))

  /** Distributed build: one ObjectHashAggregate whose partials are
    * per-task bitsets OR-merged through the shuffle — no driver-side
    * collect of the shingle set, so the build scales with executor
    * count, not driver memory. Returns the bitset.
    */
  def build(
      toks: org.apache.spark.sql.DataFrame,
      colName: String,
      expectedItems: Long,
      fpp: Double): (Array[Long], Int) = {
    val (words, k) = plan(expectedItems, fpp)
    val agg = org.apache.spark.sql.functions.udaf(new BloomBuildAggregator(words, k))
    val bytes = toks
      .agg(agg(org.apache.spark.sql.functions.col(colName)).as("bloom"))
      .head().getAs[Array[Byte]]("bloom")
    val bits = new Array[Long](words)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    var i = 0
    while (i < words) { bits(i) = bb.getLong(); i += 1 }
    (bits, k)
  }
}

/** Builds the bitset distributively: reduce sets each token's bits in a
  * per-task buffer, merge ORs buffers — associative and commutative, so
  * partial aggregation applies like any sum.
  */
class BloomBuildAggregator(numWords: Int, numHashes: Int)
    extends Aggregator[String, Array[Long], Array[Byte]] {

  override def zero: Array[Long] = new Array[Long](numWords)

  override def reduce(b: Array[Long], tok: String): Array[Long] = {
    if (tok != null)
      BloomShingles.setBits(b, UTF8String.fromString(tok), numHashes)
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(b.length * 8)
    b.foreach(bb.putLong)
    bb.array()
  }

  override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** `any(shingle in bloom)` over an `array<string>` column. The bitset
  * rides into the generated code as a referenced object (a few MB for
  * millions of shingles), and the probe loop — two xxhash64 calls plus
  * `numHashes` bit tests per shingle, early-exit on the first hit — is
  * fused into the scan's WholeStageCodegen stage. Null array → null;
  * null elements never match.
  */
case class BloomAnyContain(
    child: Expression, bits: Array[Long], numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0 && numHashes <= 16)

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_any"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t) &&
        BloomShingles.testBits(bits, arr.getUTF8String(t), numHashes))
        return true
      t += 1
    }
    false
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
      val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      val found = ctx.freshName("found")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val i = ctx.freshName("i")
      val pos = ctx.freshName("pos")
      val all = ctx.freshName("all")
      val mBits = s"((long) $bitsRef.length * 64L)"
      s"""
         |int $n = $a.numElements();
         |boolean $found = false;
         |for (int $t = 0; $t < $n && !$found; $t++) {
         |  if (!$a.isNullAt($t)) {
         |    long $h1 = $xxh.hashUTF8String($a.getUTF8String($t), 42L);
         |    long $h2 = $xxh.hashLong($h1, 7L);
         |    boolean $all = true;
         |    for (int $i = 0; $i < $numHashes && $all; $i++) {
         |      long $pos = java.lang.Long.remainderUnsigned($h1 + $i * $h2, $mBits);
         |      $all = ($bitsRef[(int)($pos >>> 6)] & (1L << ($pos & 63L))) != 0L;
         |    }
         |    $found = $all;
         |  }
         |}
         |${ev.value} = $found;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
