package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: rewrite constant-pattern `RLIKE` predicates whose
  * pattern is (anchored) literal / prefix / suffix / infix into the
  * equivalent codegen'd string predicates (EqualTo / StartsWith / EndsWith /
  * Contains) — the Prometheus fastRegexMatcher optimization (reference
  * label.go:111-148) lifted into Catalyst so it applies to any user SQL,
  * not just the engine's own matcher API (which applies the same fast path
  * at plan-build time in [[graft.Tsdb.matcherPredicate]]).
  *
  * Conservative: only fires when the pattern body is free of regex
  * metacharacters. Java regex `find()` semantics are preserved:
  * `^p$` → equals, `^p` → startswith, `p$` → endswith, `p` → contains
  * (each also in the `(?:p)` non-capturing form).
  */
object RewriteAnchoredRegex extends Rule[LogicalPlan] {

  private def isLiteralBody(s: String): Boolean =
    s.nonEmpty && s.forall(c => !"\\.+*?()|[]{}^$".contains(c))

  /** Java regex (non-MULTILINE) `$` matches at the end of input OR just
    * before a line terminator at the end of input — so `"p\n" RLIKE "p$"`
    * is true. The `$`-anchored rewrites must therefore accept an optional
    * final terminator; a plain EndsWith/EqualTo would silently change the
    * result for strings with a trailing newline (this rule is injected
    * globally and must preserve semantics for arbitrary user SQL).
    */
  private val FinalTerminators = Seq("\n", "\r", "\r\n", "\u0085", "\u2028", "\u2029")

  private[plans] def rewrite(child: Expression, pattern: String): Option[Expression] = {
    def lit(s: String) = Literal(UTF8String.fromString(s), StringType)
    def unwrap(s: String): String =
      if (s.startsWith("(?:") && s.endsWith(")") && isLiteralBody(
        s.stripPrefix("(?:").stripSuffix(")"))) s.stripPrefix("(?:").stripSuffix(")")
      else s
    def anyOf(alts: Seq[Expression]): Expression = alts.reduce(Or(_, _))
    val anchoredBoth = pattern.startsWith("^") && pattern.endsWith("$")
    val anchoredStart = pattern.startsWith("^") && !pattern.endsWith("$")
    val anchoredEnd = !pattern.startsWith("^") && pattern.endsWith("$")
    if (anchoredBoth) {
      val body = unwrap(pattern.substring(1, pattern.length - 1))
      if (isLiteralBody(body))
        Some(anyOf((body +: FinalTerminators.map(body + _))
          .map(s => EqualTo(child, lit(s)))))
      else None
    } else if (anchoredStart) {
      // `^` (non-MULTILINE) matches only at input start: StartsWith is exact
      val body = unwrap(pattern.substring(1))
      if (isLiteralBody(body)) Some(StartsWith(child, lit(body))) else None
    } else if (anchoredEnd) {
      val body = unwrap(pattern.substring(0, pattern.length - 1))
      if (isLiteralBody(body))
        Some(anyOf((body +: FinalTerminators.map(body + _))
          .map(s => EndsWith(child, lit(s)))))
      else None
    } else {
      if (isLiteralBody(pattern)) Some(Contains(child, lit(pattern))) else None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case r @ RLike(child, Literal(p: UTF8String, StringType)) =>
        rewrite(child, p.toString).getOrElse(r)
    }
}

/** SQL surface for the engine's native expressions, so `spark.sql` users
  * can call them without the Scala API:
  *
  *   SELECT graft_dot(a, b)                      -- sequential dot product
  *   SELECT graft_minhash_sig(tokens, 128)       -- MinHash signature
  *   SELECT graft_probe_buckets(proj, 4, 3)      -- multiprobe LSH buckets
  *
  * Registered automatically by [[GraftExtensions]] (config path) or
  * explicitly via [[GraftFunctions.register]] on a live session.
  */
object GraftFunctions {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.types.{ArrayType, DoubleType}

  private def asDoubleArray(e: Expression): Expression =
    Cast(e, ArrayType(DoubleType))

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(n: Int, org.apache.spark.sql.types.IntegerType) => n
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> { args =>
      require(args.length == 2, "graft_dot(a, b)")
      DotProduct(asDoubleArray(args(0)), asDoubleArray(args(1)))
    },
    "graft_minhash_sig" -> { args =>
      require(args.length == 2, "graft_minhash_sig(tokens, numHashes)")
      MinHashSignature(args(0), intLit(args(1), "numHashes"))
    },
    "graft_probe_buckets" -> { args =>
      require(args.length == 3, "graft_probe_buckets(proj, bands, probeBits)")
      ProbeBuckets(args(0), intLit(args(1), "bands"),
        intLit(args(2), "probeBits"))
    },
    "graft_media_field" -> { args =>
      require(args.length == 2, "graft_media_field(bin, 'field')")
      val name = args(1) match {
        case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) =>
          s.toString
        case other => throw new IllegalArgumentException(
          s"field name must be a string literal, got $other")
      }
      MediaHeaderField(args(0), name)
    },
    "graft_media_encode" -> { args =>
      require(args.length == 5,
        "graft_media_encode(payload, width, height, channels, nFrames)")
      MediaHeaderEncode(args(0), args(1), args(2), args(3), args(4))
    })

  /** Imperative registration on a live session (the extensions path does
    * the same through injectFunction at session build).
    */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

/** Session extension entry point:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RewriteAnchoredRegex)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    GraftFunctions.builders.foreach { case (name, builder) =>
      e.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.plans.GraftFunctions", name),
        builder))
    }
  }
}
