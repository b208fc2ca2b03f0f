package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only scratch main: schema / plan exploration. Not part of the API. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession
      .builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    for (t <- Seq("events", "orders", "lineitem", "documents", "embeddings")) {
      println(s"=== $t")
      val df = spark.read.parquet(s"$dir/$t.parquet")
      println(df.schema.treeString)
      df.show(3, 60, vertical = false)
    }
    spark.stop()
  }
}
