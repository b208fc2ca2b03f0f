package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression computing ALL hyperplane projections of an
  * embedding vector in one pass: `out[j] = Σ_i vec[i] * signs[j*dim + i]`.
  *
  * The LSH signature step needs `nPlanes` dot products per row; composing
  * `nPlanes` [[DotProduct]]s against `nPlanes` literal arrays works but
  * makes the expression tree (and generated code) grow with the plane
  * count — measurable seconds of analysis/codegen latency per query at 24+
  * planes. This expression carries the whole ±1 sign matrix as ONE
  * reference object and emits one nested primitive loop, so plan size is
  * constant in `nPlanes` and the inner loop is JIT-friendly flat double
  * math. Each projection is the same strict left-to-right fold as
  * [[DotProduct]], so signatures are bit-identical to the composed form.
  *
  * Null contract: null vector → null; elements are read as primitives
  * (embedding vectors carry no null elements). Rows whose vector is
  * shorter than the plane dimension project over the shared prefix.
  */
case class PlaneProjections(
    child: Expression,
    signs: Array[Double],
    nPlanes: Int)
    extends UnaryExpression {

  require(nPlanes > 0 && signs.length % nPlanes == 0,
    "signs length must be nPlanes * dim")

  private def dimPerPlane: Int = signs.length / nPlanes

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "graft_plane_proj"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val d = math.min(x.numElements(), dimPerPlane)
    val out = new Array[Double](nPlanes)
    var j = 0
    while (j < nPlanes) {
      val off = j * dimPerPlane
      var s = 0.0
      var i = 0
      while (i < d) {
        s += x.getDouble(i) * signs(off + i)
        i += 1
      }
      out(j) = s
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val signsRef = ctx.addReferenceObj("planeSigns", signs, "double[]")
      val dpp = dimPerPlane
      // locals via freshName: two instances of this expression can be
      // inlined into one codegen'd function without block scoping
      val d = ctx.freshName("d")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val off = ctx.freshName("off")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $d = java.lang.Math.min($a.numElements(), $dpp);
         |double[] $out = new double[$nPlanes];
         |for (int $j = 0; $j < $nPlanes; $j++) {
         |  int $off = $j * $dpp;
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $d; $i++) {
         |    $s += $a.getDouble($i) * $signsRef[$off + $i];
         |  }
         |  $out[$j] = $s;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PlaneProjections {
  /** All `planes.length` projections of `vec` (cast to array<double>). */
  def project(vec: Column, planes: Seq[Array[Double]]): Column = {
    require(planes.nonEmpty && planes.forall(_.length == planes.head.length),
      "planes must be non-empty and rectangular")
    GraftBridge.column(PlaneProjections(
      Cast(GraftBridge.expression(vec), ArrayType(DoubleType)),
      planes.flatten.toArray,
      planes.length))
  }
}

/** Native multiprobe bucket generation from a projection array: for each of
  * `bands` bands of `r = nProj/bands` sign bits, emit the base bucket and —
  * when `probeBits > 0` — every XOR-combination of flips of the `probeBits`
  * lowest-|projection| bits (the weakness-guided probe set of Lv et al.,
  * multi-probe LSH). Output: `array<long>` of length `bands * 2^probeBits`,
  * laid out band-major, so `band = pos / 2^probeBits` after `posexplode`.
  *
  * One expression instead of per-band `array_sort`/`transform`/XOR-fold
  * trees: the equivalent HOF formulation generated Janino-heavy code whose
  * one-off compile latency (seconds) exceeded the query's runtime on
  * anything but the largest corpora. `probeBits = 0` degenerates to the
  * plain signature buckets, so corpus and query sides share this operator.
  */
case class ProbeBuckets(child: Expression, bands: Int, probeBits: Int)
    extends UnaryExpression {

  require(bands > 0 && probeBits >= 0 && probeBits <= 20)

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def prettyName: String = "graft_probe_buckets"

  override def nullSafeEval(v: Any): Any = {
    val p = v.asInstanceOf[ArrayData]
    val n = p.numElements()
    val r = n / bands
    val probes = 1 << probeBits
    val out = new Array[Long](bands * probes)
    val idx = new Array[Int](r)
    var b = 0
    while (b < bands) {
      var base = 0L
      var i = 0
      while (i < r) {
        if (p.getDouble(b * r + i) >= 0) base |= (1L << i)
        idx(i) = i
        i += 1
      }
      // partial selection of the probeBits smallest |projection| bits
      // (strict < keeps the lowest index on ties — deterministic, and
      // identical to the codegen'd form below)
      var t = 0
      while (t < math.min(probeBits, r)) {
        var best = t
        var u = t + 1
        while (u < r) {
          if (math.abs(p.getDouble(b * r + idx(u))) <
            math.abs(p.getDouble(b * r + idx(best)))) best = u
          u += 1
        }
        val tmp = idx(t); idx(t) = idx(best); idx(best) = tmp
        t += 1
      }
      var m = 0
      while (m < probes) {
        var bucket = base
        var t2 = 0
        while (t2 < math.min(probeBits, r)) {
          if (((m >> t2) & 1) == 1) bucket ^= (1L << idx(t2))
          t2 += 1
        }
        out(b * probes + m) = bucket
        m += 1
      }
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val probes = 1 << probeBits
      // locals via freshName so duplicate instances inline safely
      val n = ctx.freshName("n")
      val r = ctx.freshName("r")
      val pb = ctx.freshName("pb")
      val out = ctx.freshName("out")
      val idx = ctx.freshName("idx")
      val b = ctx.freshName("b")
      val base = ctx.freshName("base")
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      val best = ctx.freshName("best")
      val u = ctx.freshName("u")
      val tmp = ctx.freshName("tmp")
      val m = ctx.freshName("m")
      val bucket = ctx.freshName("bucket")
      val t2 = ctx.freshName("t2")
      s"""
         |int $n = $a.numElements();
         |int $r = $n / $bands;
         |int $pb = java.lang.Math.min($probeBits, $r);
         |long[] $out = new long[$bands * $probes];
         |int[] $idx = new int[$r];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $base = 0L;
         |  for (int $i = 0; $i < $r; $i++) {
         |    if ($a.getDouble($b * $r + $i) >= 0) $base |= (1L << $i);
         |    $idx[$i] = $i;
         |  }
         |  for (int $t = 0; $t < $pb; $t++) {
         |    int $best = $t;
         |    for (int $u = $t + 1; $u < $r; $u++) {
         |      if (java.lang.Math.abs($a.getDouble($b * $r + $idx[$u])) <
         |          java.lang.Math.abs($a.getDouble($b * $r + $idx[$best]))) $best = $u;
         |    }
         |    int $tmp = $idx[$t]; $idx[$t] = $idx[$best]; $idx[$best] = $tmp;
         |  }
         |  for (int $m = 0; $m < $probes; $m++) {
         |    long $bucket = $base;
         |    for (int $t2 = 0; $t2 < $pb; $t2++) {
         |      if ((($m >> $t2) & 1) == 1) $bucket ^= (1L << $idx[$t2]);
         |    }
         |    $out[$b * $probes + $m] = $bucket;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ProbeBuckets {
  /** Band-major probe buckets of a projection array (see class doc). */
  def buckets(proj: Column, bands: Int, probeBits: Int): Column =
    GraftBridge.column(ProbeBuckets(
      GraftBridge.expression(proj), bands, probeBits))
}
