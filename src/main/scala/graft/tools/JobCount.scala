package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev-only: run one registered query end-to-end and report how many
  * Spark jobs it launched plus wall time — the receipt for job-floor
  * optimizations (iterative loops at local scale are scheduler-bound,
  * so the job count is the stable, window-noise-immune metric).
  *
  * Usage: runMain graft.tools.JobCount <sfDir> name1 [name2 ...]
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: JobCount <sfDir> name1 [name2 ...]")
    val dir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[jobs] unknown query: $name")
        case Some(fn) =>
          // warm run (JIT/IO), then the counted run
          fn(spark, dir).count()
          val tracker = spark.sparkContext.statusTracker
          val before = tracker.getJobIdsForGroup(null).length
          val t0 = System.nanoTime()
          fn(spark, dir).count()
          val wall = (System.nanoTime() - t0) / 1e9
          val after = tracker.getJobIdsForGroup(null).length
          println(f"[jobs] $name jobs=${after - before} wall=$wall%.2f")
      }
    }
    spark.stop()
  }
}
