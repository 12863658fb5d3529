package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import java.util.concurrent.atomic.AtomicLong

/** Scratch probe (r15): where does the v2 near-dup ledger admit spend
  * its extra wall vs the r14 flat layout at bench scale? Times the
  * write shapes and probe shapes in isolation. */
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
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    time("warm")(docs.count())
    val cut = docs.agg(max(col("doc_id"))).head().getLong(0) / 2
    val root = java.nio.file.Files.createTempDirectory("graft_t15").toString
    try {
      val l1 = s"$root/l1"
      time("admit1 (fresh ledger)")(
        Dedup.nearDupLedgerAdmit(spark, l1, docs.filter(col("doc_id") <= cut),
          "doc_id", "text").count())
      time("admit2 (vs history)")(
        Dedup.nearDupLedgerAdmit(spark, l1, docs.filter(col("doc_id") > cut),
          "doc_id", "text").count())
      // warm second ledger: the q129 shape without JIT warmup
      val l2 = s"$root/l2"
      time("admit1 WARM")(
        Dedup.nearDupLedgerAdmit(spark, l2, docs.filter(col("doc_id") <= cut),
          "doc_id", "text").count())
      time("admit2 WARM")(
        Dedup.nearDupLedgerAdmit(spark, l2, docs.filter(col("doc_id") > cut),
          "doc_id", "text").count())
      time("forget WARM (half of batch1)")(
        Dedup.nearDupLedgerForget(spark, l2,
          docs.filter(col("doc_id") <= cut && col("doc_id") % 3 === 0)
            .select("doc_id"), "doc_id"))
      // write-shape A/B on a batch-sized signature frame
      val sig = Dedup.minHashSignatures(docs.filter(col("doc_id") <= cut),
          "doc_id", "text")
        .withColumnRenamed("doc_id", "doc")
        .withColumn("text_md5", lit("x"))
        .withColumn("hs", typedlit(Seq(1L,2L,3L)))
        .localCheckpoint()
      println(s"sig rows: ${sig.count()}")
      time("flat write (r14 primary shape)")(
        sig.write.mode("overwrite").parquet(s"$root/flat"))
      time("db-partitioned write (v2 primary shape)")(
        sig.withColumn("db", pmod(xxhash64(col("doc")), lit(32L)).cast("int"))
          .repartition(col("db"))
          .write.mode("overwrite").partitionBy("db").parquet(s"$root/dbp"))
      val keys = Dedup.ndlWithKb(Dedup.ndlBandKeys(sig, 4, 4)).localCheckpoint()
      println(s"band rows: ${keys.count()}")
      time("band write (kb-partitioned, 32 dirs)")(
        keys.select(col("kb"), col("band"), col("kh"), col("doc"))
          .repartition(col("kb"))
          .sortWithinPartitions(col("band"), col("kh"))
          .write.mode("overwrite").partitionBy("kb").parquet(s"$root/bands"))
      time("band write UNPARTITIONED (flat)")(
        keys.select(col("band"), col("kb"), col("kh"), col("doc"))
          .write.mode("overwrite").parquet(s"$root/bandsflat"))
      // probe-shape A/B
      val probeKeys = Dedup.ndlWithKb(Dedup.ndlBandKeys(sig, 4, 4)
        .withColumnRenamed("doc", "doc_b")).localCheckpoint()
      probeKeys.count()
      time("probe vs band store (DPP path) x3")((1 to 3).foreach(_ =>
        spark.read.parquet(s"$root/bands")
          .join(broadcast(probeKeys), Seq("band","kb","kh"))
          .select(col("doc").as("doc_a"), col("doc_b")).distinct().count()))
      time("probe vs derived keys (r14 shape) x3")((1 to 3).foreach(_ =>
        Dedup.ndlWithKb(Dedup.ndlBandKeys(
            spark.read.parquet(s"$root/dbp"), 4, 4)
          .withColumnRenamed("doc", "doc_a"))
          .join(broadcast(probeKeys), Seq("band","kb","kh"))
          .select(col("doc_a"), col("doc_b")).distinct().count()))
    } finally graft.util.Fs.deleteRecursively(root)
    spark.stop()
  }
}
