package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Demonstrates shuffle-free co-located joins via bucketing (SURVEY.md
  * "Partitioning & shuffle": pre-partition both sides of a recurring join
  * key so repeated joins skip the exchange entirely — the 100-TB pattern
  * for fact-to-fact joins that can't broadcast).
  *
  * `sbt "runMain graft.tools.BucketedJoinDemo"` — writes lineitem+orders
  * bucketed by the join key, then shows the join plan with NO Exchange on
  * either side, vs the shuffled plan for plain parquet.
  */
object BucketedJoinDemo {
  def main(args: Array[String]): Unit = {
    val wh = Files.createTempDirectory("graft_wh").toString
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
      .config("spark.sql.ui.explainMode", "formatted")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"

    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val o = spark.read.parquet(s"$dir/orders.parquet")

    println("== plain parquet join: both sides exchange ==")
    val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("cnt"))
    plain.explain()

    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_b")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_b")

    println("== bucketed join: no Exchange on either side ==")
    val bucketed = spark.table("li_b")
      .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("cnt"))
    bucketed.explain()

    val a = plain.orderBy("o_orderpriority").collect().map(_.toString).toSeq
    val b = bucketed.orderBy("o_orderpriority").collect().map(_.toString).toSeq
    println(s"results equal: ${a == b}; rows: ${a.size}")
    spark.stop()
  }
}
