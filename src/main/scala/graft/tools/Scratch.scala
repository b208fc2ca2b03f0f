package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch main: schema / plan exploration. Not part of the API.
  *
  * Current use: probe an existing (possibly appended-to) IVF index at a
  * given path for a synthetic appended vector, at several nProbe values —
  * separates "the appended vector is in the cells and findable" from the
  * cosine-centroid-ranking recall trade at nProbe=1.
  * args: [indexPath] [vecId] [dim]
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse(
      "spark-warehouse/graft_scratch/ivf_append_sf0.1_x100_c2441")
    val vecId = args.lift(1).flatMap(_.toLongOption).getOrElse(5000000L)
    val dim = args.lift(2).flatMap(_.toIntOption).getOrElse(64)
    val spark = SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def u(h: org.apache.spark.sql.Column) =
      pmod(h, lit(1 << 20)).cast("double") / lit((1 << 20).toDouble)
    // the IvfAppendBench synthetic batch recipe, reproduced for one id
    val q = spark.range(1)
      .select(lit(-1L).as("vec_id"))
      .withColumn("embedding",
        transform(sequence(lit(0), lit(dim - 1)), i =>
          (u(xxhash64(lit("apnd"), lit(vecId), i)) * 2 - 1).cast("float")))
    for (np <- Seq(1, 2, 4, 8)) {
      val top = graft.operators.Similarity
        .ivfProbeTopK(spark, path, q, "vec_id", "embedding", 3, nProbe = np)
        .select("nid", "sim").collect()
        .map(r => s"${r.getLong(0)}:${r.getDouble(1)}").mkString(", ")
      println(s"nProbe=$np -> $top")
    }
    spark.stop()
  }
}
