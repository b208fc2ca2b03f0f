package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: rep-by-rep convergence curve for one registered query
  * (default ann_clustered_ivf) — distinguishes a real plan regression
  * (flat curve above baseline) from JIT warmup (curve converging to
  * baseline). Prints every rep, not the min.
  */
object IvfReps {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("ann_clustered_ivf")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).flatMap(_.toIntOption).getOrElse(8)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.prewarm(spark, dir, Some(Set(name)))
    val fn = graft.SparkEntry.queries(name)
    val times = (1 to reps).map { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"rep $i: $s%.2f s ($n rows)")
      s
    }
    println(f"$name min=${times.min}%.2f last3min=${times.takeRight(3).min}%.2f")
    spark.stop()
  }
}
