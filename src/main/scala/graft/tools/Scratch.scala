package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch main: schema / plan exploration. Not part of the API. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession
      .builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("ansi.enabled = " + spark.conf.get("spark.sql.ansi.enabled"))
    val df = spark.createDataFrame(Seq(
      ("a", 1.0), ("a", Double.NaN), ("a", Double.PositiveInfinity)))
      .toDF("k", "v")
    // 1: does cast(NaN as decimal) throw or NULL?
    try {
      val r = df.select(sum(col("v").cast("decimal(18,2)"))).collect()
      println("cast-sum ok: " + r.mkString(","))
    } catch { case e: Throwable =>
      println("cast-sum THREW: " + e.getClass.getName + " " +
        e.getMessage.take(200))
    }
    // 2: try_cast path
    val r2 = df.select(
      sum(expr("try_cast(v as decimal(18,2))")).as("s"),
      count(lit(1)).as("n"),
      min("v").as("mn"), max("v").as("mx")).collect()
    println("try_cast: " + r2.mkString(","))
    // 3: -0.0 string cast
    println("str(-0.0) = " + spark.range(1)
      .select(lit(-0.0).cast("string")).head().getString(0))
    // 4: double division by zero under ANSI
    try {
      val r3 = spark.range(1).select(lit(1.0) / lit(0.0)).collect()
      println("double-div ok: " + r3.mkString(","))
    } catch { case e: Throwable =>
      println("double-div THREW: " + e.getMessage.take(120))
    }
    spark.stop()
  }
}
