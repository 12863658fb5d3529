package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew handling for joins (SURVEY.md "salting for skew, AQE for runtime
  * re-plan"): a fact table where one key owns most rows makes one
  * sort-merge task the straggler. Shows three plans on the same data:
  *
  *   1. AQE disabled   — the baseline straggler join
  *   2. AQE skew-join  — runtime split of oversized partitions (idiomatic
  *                       Spark-first answer; nothing to hand-tune)
  *   3. manual salting — fact side salted `key -> (key, id % S)`, dim side
  *                       replicated S×; the portable technique when AQE
  *                       can't see the skew (e.g. aggregation states)
  *
  * `sbt "runMain graft.tools.SkewJoinDemo"`
  */
object SkewJoinDemo {
  private val S = 16 // salt fan-out

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 2M-row fact, 80% on key 0; 50k-row dim (non-broadcastable here)
    val fact = spark.range(2000000).select(
      when(col("id") % 5 =!= 0, lit(0L)).otherwise(col("id") % 50000)
        .as("k"),
      col("id").as("v"))
    val dim = spark.range(50000).select(col("id").as("k"),
      (col("id") * 7).as("w"))

    def time(label: String)(df: DataFrame): Long = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      n
    }

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val base = time("AQE off (straggler)")(
      fact.join(dim, Seq("k")).select(col("v") + col("w")))

    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    val aqe = time("AQE skew-join")(
      fact.join(dim, Seq("k")).select(col("v") + col("w")))

    // manual salting: deterministic salt on the fact, dim replicated S×
    val saltedFact = fact.withColumn("salt", (col("v") % S).cast("int"))
    val saltedDim = dim.crossJoin(
      spark.range(S).select(col("id").cast("int").as("salt")))
    val salted = time("manual salting")(
      saltedFact.join(saltedDim, Seq("k", "salt"))
        .select(col("v") + col("w")))

    require(base == aqe && aqe == salted, "row counts must agree")
    println("  all three strategies agree on the result size")
    spark.stop()
  }
}
