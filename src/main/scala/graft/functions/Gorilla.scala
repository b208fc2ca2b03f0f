package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Gorilla time-series compression (Pelkonen et al., "Gorilla: A Fast,
  * Scalable, In-Memory Time Series Database", VLDB 2015): delta-of-delta
  * timestamp encoding + XOR float encoding, bit-packed. This is the
  * algorithm the reference consumes through its vendored tsz library
  * (capability O20 in SURVEY §2.1) — implemented here from the published
  * paper, not from any existing codebase.
  *
  * Encoding layout (this implementation):
  *   [int32 n] [int64 ts0] [int64 value0 bits] then per point:
  *   dod buckets '0' | '10'+7b | '110'+9b | '1110'+12b | '1111'+64b
  *   xor buckets '0' (same) | '10'+reuse window | '11'+5b lead+6b len+bits
  *
  * Points must be fed in ascending-ts order (the aggregator sorts).
  */
object Gorilla {

  private final class BitWriter {
    private val buf = new ArrayBuffer[Byte]()
    private var cur = 0
    private var nbits = 0
    def writeBit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1)
      nbits += 1
      if (nbits == 8) { buf += cur.toByte; cur = 0; nbits = 0 }
    }
    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { writeBit(((v >>> i) & 1L).toInt); i -= 1 }
    }
    def result(): Array[Byte] = {
      val out = buf.clone()
      if (nbits > 0) out += (cur << (8 - nbits)).toByte
      out.toArray
    }
  }

  private final class BitReader(bytes: Array[Byte], startBit: Int) {
    private var pos = startBit
    def readBit(): Int = {
      val b = (bytes(pos >> 3) >> (7 - (pos & 7))) & 1
      pos += 1
      b
    }
    def readBits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
  }

  def encode(points: Seq[(Long, Double)]): Array[Byte] = {
    val n = points.length
    val head = java.nio.ByteBuffer.allocate(4 + (if (n > 0) 16 else 0))
    head.putInt(n)
    if (n == 0) return head.array()
    head.putLong(points.head._1)
    head.putLong(java.lang.Double.doubleToLongBits(points.head._2))
    val w = new BitWriter
    var prevTs = points.head._1
    var prevDelta = 0L
    var prevVal = java.lang.Double.doubleToLongBits(points.head._2)
    var prevLead = -1
    var prevTrail = -1
    var i = 1
    while (i < n) {
      val (ts, value) = points(i)
      // --- timestamp: delta-of-delta buckets (paper §4.1.1)
      val delta = ts - prevTs
      val dod = delta - prevDelta
      if (dod == 0) w.writeBit(0)
      else if (dod >= -63 && dod <= 64) { w.writeBits(2L, 2); w.writeBits(dod + 63, 7) }
      else if (dod >= -255 && dod <= 256) { w.writeBits(6L, 3); w.writeBits(dod + 255, 9) }
      else if (dod >= -2047 && dod <= 2048) { w.writeBits(14L, 4); w.writeBits(dod + 2047, 12) }
      else { w.writeBits(15L, 4); w.writeBits(dod, 64) }
      prevDelta = delta
      prevTs = ts
      // --- value: XOR buckets (paper §4.1.2)
      val bits = java.lang.Double.doubleToLongBits(value)
      val xor = bits ^ prevVal
      if (xor == 0) w.writeBit(0)
      else {
        val lead = math.min(java.lang.Long.numberOfLeadingZeros(xor), 31)
        val trail = java.lang.Long.numberOfTrailingZeros(xor)
        if (prevLead >= 0 && lead >= prevLead && trail >= prevTrail) {
          // control '10': reuse the previous meaningful-bit window
          w.writeBits(2L, 2)
          val len = 64 - prevLead - prevTrail
          w.writeBits(xor >>> prevTrail, len)
        } else {
          // control '11': new window
          w.writeBits(3L, 2)
          val len = 64 - lead - trail
          w.writeBits(lead.toLong, 5)
          w.writeBits((len - 1).toLong, 6) // 1..64 stored as 0..63
          w.writeBits(xor >>> trail, len)
          prevLead = lead
          prevTrail = trail
        }
      }
      prevVal = bits
      i += 1
    }
    val body = w.result()
    val out = java.nio.ByteBuffer.allocate(head.capacity() + body.length)
    out.put(head.array())
    out.put(body)
    out.array()
  }

  def decode(bytes: Array[Byte]): Seq[(Long, Double)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    if (n == 0) return Seq.empty
    val ts0 = bb.getLong
    val v0 = java.lang.Double.longBitsToDouble(bb.getLong)
    val out = new ArrayBuffer[(Long, Double)](n)
    out += ((ts0, v0))
    val r = new BitReader(bytes, 20 * 8)
    var prevTs = ts0
    var prevDelta = 0L
    var prevVal = java.lang.Double.doubleToLongBits(v0)
    var prevLead = -1
    var prevTrail = -1
    var i = 1
    while (i < n) {
      // timestamps
      val dod =
        if (r.readBit() == 0) 0L
        else if (r.readBit() == 0) r.readBits(7) - 63
        else if (r.readBit() == 0) r.readBits(9) - 255
        else if (r.readBit() == 0) r.readBits(12) - 2047
        else r.readBits(64)
      prevDelta += dod
      prevTs += prevDelta
      // values
      val bits =
        if (r.readBit() == 0) prevVal
        else if (r.readBit() == 0) {
          val len = 64 - prevLead - prevTrail
          prevVal ^ (r.readBits(len) << prevTrail)
        } else {
          val lead = r.readBits(5).toInt
          val len = r.readBits(6).toInt + 1
          val trail = 64 - lead - len
          prevLead = lead
          prevTrail = trail
          prevVal ^ (r.readBits(len) << trail)
        }
      prevVal = bits
      out += ((prevTs, java.lang.Double.longBitsToDouble(bits)))
      i += 1
    }
    out.toSeq
  }
}
