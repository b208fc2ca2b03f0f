package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.RewriteAnchoredRegex

/** The RLIKE→string-predicate optimizer rule rewrites anchored-literal
  * patterns and leaves genuine regexes alone — with identical results
  * either way. (Registered here via `experimental.extraOptimizations` on a
  * fresh child session because `getOrCreate` in a shared test JVM would
  * return another suite's session and silently drop `withExtensions`;
  * production registers the same rule through [[graft.plans.GraftExtensions]].)
  */
class ExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("ExtensionsSpec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
      .newSession()
    s.experimental.extraOptimizations = Seq(RewriteAnchoredRegex)
    // keep the LocalRelation from being constant-folded away so the test
    // can inspect the optimized predicate
    s.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
    s
  }

  private def optimized(sql: String): String = {
    spark.sql(sql).queryExecution.optimizedPlan.toString
  }

  test("anchored literal patterns are rewritten to string predicates") {
    import spark.implicits._
    Seq("disk.used", "disk.read.ops", "cpu.busy", "mem")
      .toDF("m").createOrReplaceTempView("metrics")
    val full = optimized("SELECT * FROM metrics WHERE m RLIKE '^(?:cpu\\\\.busy)$'")
    // the dotted literal contains a backslash-escaped dot => not literal: stays RLIKE
    assert(full.contains("RLIKE"))
    val eq = optimized("SELECT * FROM metrics WHERE m RLIKE '^(?:mem)$'")
    assert(!eq.contains("RLIKE") && eq.contains("= mem"), eq)
    val pre = optimized("SELECT * FROM metrics WHERE m RLIKE '^disk'")
    assert(!pre.contains("RLIKE") && pre.contains("StartsWith"), pre)
    val suf = optimized("SELECT * FROM metrics WHERE m RLIKE 'ops$'")
    assert(!suf.contains("RLIKE") && suf.contains("EndsWith"), suf)
    val contains = optimized("SELECT * FROM metrics WHERE m RLIKE 'read'")
    assert(!contains.contains("RLIKE") && contains.contains("Contains"), contains)
  }

  test("rewritten predicates return identical rows") {
    import spark.implicits._
    Seq("disk.used", "disk.read.ops", "cpu.busy", "mem")
      .toDF("m").createOrReplaceTempView("metrics2")
    def rows(pred: String): Set[String] =
      spark.sql(s"SELECT m FROM metrics2 WHERE $pred")
        .collect().map(_.getString(0)).toSet
    assert(rows("m RLIKE '^disk'") == Set("disk.used", "disk.read.ops"))
    assert(rows("m RLIKE 'ops$'") == Set("disk.read.ops"))
    assert(rows("m RLIKE 'read'") == Set("disk.read.ops"))
    assert(rows("m RLIKE '^(?:mem)$'") == Set("mem"))
    // genuine regex still works through the unrewritten path
    assert(rows("m RLIKE '^disk\\\\..*ops$'") == Set("disk.read.ops"))
  }

  test("registered SQL functions evaluate the native expressions") {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b").createOrReplaceTempView("vecs")
    val dot = spark.sql("SELECT graft_dot(a, b) AS d FROM vecs")
      .head().getDouble(0)
    assert(dot == 32.0)
    Seq(Tuple1(Seq("alpha", "beta"))).toDF("toks")
      .createOrReplaceTempView("toks_t")
    // SQL form must equal the Scala column API form bit-for-bit
    val viaSql = spark.sql(
      "SELECT graft_minhash_sig(toks, 8) AS sig FROM toks_t")
      .head().getAs[scala.collection.Seq[Long]](0)
    val viaApi = spark.table("toks_t")
      .select(graft.plans.MinHashSignature.signature(
        org.apache.spark.sql.functions.col("toks"), 8).as("sig"))
      .head().getAs[scala.collection.Seq[Long]](0)
    assert(viaSql == viaApi && viaSql.length == 8)
    val buckets = spark.sql(
      "SELECT graft_probe_buckets(array(1.0d, -2.0d, 0.5d, -0.1d), 2, 1) AS b")
      .head().getAs[scala.collection.Seq[Long]](0)
    assert(buckets.length == 4) // 2 bands x 2^1 probes
  }

  test("$-anchored rewrites preserve Java regex final-terminator semantics") {
    import spark.implicits._
    // Java regex `$` (find, non-MULTILINE) matches before a final line
    // terminator: "p\n" RLIKE 'p$' is TRUE. The rewrite must agree for
    // every terminator form and still reject non-final ones.
    val values = Seq(
      "p", "p\n", "p\r", "p\r\n", "p\u0085", "p\u2028", "p\u2029",
      "p\n\n", "p\nx", "xp", "xp\n", "q", "q\n", "pq")
    values.toDF("s").createOrReplaceTempView("nl")
    def rows(pred: String): Set[String] =
      spark.sql(s"SELECT s FROM nl WHERE $pred")
        .collect().map(_.getString(0)).toSet
    def regexRef(pat: String): Set[String] = {
      val p = java.util.regex.Pattern.compile(pat)
      values.filter(v => p.matcher(v).find()).toSet
    }
    for (pat <- Seq("p$", "^p$", "^(?:p)$")) {
      val plan = spark.sql(s"SELECT s FROM nl WHERE s RLIKE '$pat'")
        .queryExecution.optimizedPlan.toString
      assert(!plan.contains("RLIKE"), s"$pat should be rewritten: $plan")
      assert(rows(s"s RLIKE '$pat'") == regexRef(pat), s"pattern $pat")
    }
  }
}
