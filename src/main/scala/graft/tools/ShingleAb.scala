package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.TextFunctions.hash60

/** In-JVM A/B of the two shingle-index spellings under the q71 and q24
  * call shapes: the forms alternate WITHIN one session (same heap, same
  * codegen cache, interleaved in time) so host noise hits both equally,
  * and the verdict is the min executor-run-time over `rounds` rounds —
  * wall clock on a shared host swings 2-3× between identical runs
  * (measured), executor CPU much less.
  *
  * `sbt "runMain graft.tools.ShingleAb [rounds]"`
  */
object ShingleAb {
  def main(args: Array[String]): Unit = {
    val rounds = if (args.nonEmpty) args(0).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val runMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) runMs.addAndGet(m.executorRunTime)
        }
      })
    val docsRaw = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val docsRep = docsRaw.repartition(32)

    def idx(df: DataFrame, hof: Boolean): DataFrame =
      Dedup.shingleIndexForm(df, "doc_id", "text", 3, hash60(_), hof)

    // q71 shape: cross-set jaccard, two index subtrees, 3 consumers each
    def q71(docs: DataFrame, hof: Boolean): Long =
      Dedup.jaccardAcross(
        idx(docs.filter(col("doc_id") >= 400), hof),
        idx(docs.filter(col("doc_id") < 400), hof), 0.8).count()
    // q24 shape: self-set jaccard, one index subtree, 2 consumers
    def q24(docs: DataFrame, hof: Boolean): Long =
      Dedup.jaccardFromIndex(idx(docs, hof), 0.8).count()

    def time(f: => Long): (Double, Double) = {
      org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext)
      val r0 = runMs.get; val t0 = System.nanoTime(); f
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext)
      (wall, (runMs.get - r0) / 1e3)
    }
    // D: checkpoint each index before the jaccardAcross fan-out (subtree
    // computed once per side instead of once per consumer)
    def q71ck(docs: DataFrame): Long =
      Dedup.jaccardAcross(
        idx(docs.filter(col("doc_id") >= 400), false).localCheckpoint(false),
        idx(docs.filter(col("doc_id") < 400), false).localCheckpoint(false),
        0.8).count()
    def q24ck(docs: DataFrame): Long =
      Dedup.jaccardFromIndex(
        idx(docs, false).localCheckpoint(false), 0.8).count()
    val docs8 = docsRaw.repartition(8)

    // warmup all paths once (codegen compilation)
    q71(docsRaw, hof = false); q71(docsRep, hof = false)
    q71ck(docsRep); q24(docsRaw, hof = false); q24ck(docsRep)
    val acc = scala.collection.mutable.Map.empty[String, List[(Double, Double)]]
      .withDefaultValue(Nil)
    for (r <- 1 to rounds; (name, f) <- Seq(
        "q71_rep32" -> (() => q71(docsRep, false)),
        "q71_rep8" -> (() => q71(docs8, false)),
        "q71_raw" -> (() => q71(docsRaw, false)),
        "q71_rep32_ck" -> (() => q71ck(docsRep)),
        "q71_rep8_ck" -> (() => q71ck(docs8)),
        "q24_rep32" -> (() => q24(docsRep, false)),
        "q24_rep8" -> (() => q24(docs8, false)),
        "q24_rep32_ck" -> (() => q24ck(docsRep)),
        "q24_rep8_ck" -> (() => q24ck(docs8)))) {
      val t = time(f())
      acc(name) = t :: acc(name)
      println(f"round $r $name wall ${t._1}%6.2f run ${t._2}%6.2f")
    }
    for ((name, ts) <- acc.toSeq.sortBy(_._1))
      println(f"$name  minWall ${ts.map(_._1).min}%6.2f  " +
        f"minRun ${ts.map(_._2).min}%6.2f  " +
        f"medRun ${ts.map(_._2).sorted.apply(ts.size / 2)}%6.2f")

    // stage-level attribution for one repartitioned q71 execution
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Int)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) stages.merge(te.stageId,
            ("", m.executorRunTime, 1),
            (a, b) => (a._1, a._2 + b._2, a._3 + b._3))
        }
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          stages.merge(sc.stageInfo.stageId,
            (sc.stageInfo.name.take(60), 0L, 0),
            (a, b) => (if (a._1.isEmpty) b._1 else a._1, a._2, a._3))
      })
    q71(docsRep, false)
    org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext)
    import scala.jdk.CollectionConverters._
    println("== per-stage run ms (q71_pos_rep) ==")
    stages.asScala.toSeq.sortBy(-_._2._2).take(20).foreach {
      case (id, (nm, ms, nt)) => println(f"stage $id%4d $ms%7d ms $nt%4d tasks  $nm") }
    spark.stop()
  }
}
