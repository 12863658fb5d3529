package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import java.util.concurrent.atomic.AtomicLong

object T15Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val runMs = new AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics; if (m != null) runMs.addAndGet(m.executorRunTime)
        }
      })
    def time[T](l: String)(f: => T): T = {
      org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext)
      val r0 = runMs.get; val t0 = System.nanoTime(); val r = f
      org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext)
      println(f"$l: wall ${(System.nanoTime()-t0)/1e9}%.2f s run ${(runMs.get-r0)/1e3.toDouble}%.2f s"); r }
    import spark.implicits._
    val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    time("warm")(e.count())
    time("plain count x3")((1 to 3).foreach(_ => e.select(count(lit(1))).head()))
    time("norm count x3")((1 to 3).foreach(_ =>
      e.select(Similarity.l2Normalize(col("embedding")).as("nv"))
        .select(count(col("nv"))).head()))
    val pairs = Similarity.semanticNearDupPairs(e, "vec_id", "embedding", 0.35, 16)
    time("t15 pairs x3")((1 to 3).foreach(_ => pairs.count()))
    spark.stop()
  }
}
