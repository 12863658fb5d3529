package graft.tools

import java.util.concurrent.ConcurrentHashMap
import scala.collection.mutable
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-JOB profiler for one or more SparkEntry queries (r19 measurement
  * harness — guide §1: attribute wall time before touching anything).
  *
  * The bench's per-entry task metrics say HOW MUCH executor time an
  * entry burns but not WHERE its wall goes: a ledger-lifecycle entry is
  * 30-80 sequential Spark jobs (checkpoints, counts, commits), and the
  * sum of per-job walls vs the entry wall exposes the driver-side gaps
  * (file commits, listings, planning) that no task metric sees.
  *
  * Usage: runMain graft.tools.QueryProbe q136_neardup_audit[,more]
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default 32). */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.ui.enabled", "false")
    // A/B experiment hook: SPARK_GRAFT_EXTRA_CONF="k=v;k2=v2"
    val builder = sys.env.get("SPARK_GRAFT_EXTRA_CONF")
      .map(_.split(";").filter(_.contains("=")))
      .getOrElse(Array.empty)
      .foldLeft(b0) { (b, kv) =>
        val Array(k, v) = kv.split("=", 2); b.config(k, v)
      }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class Job(var desc: String, var t0: Long = 0L, var t1: Long = 0L,
      var tasks: Int = 0, var runMs: Long = 0L, stages: mutable.Set[Int] = mutable.Set())
    val jobs = new ConcurrentHashMap[Int, Job]()
    val stageToJob = new ConcurrentHashMap[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        // the result stage's name carries the action's call site
        // (e.g. "parquet at Dedup.scala:2092") — the attribution we need
        val d = e.stageInfos.sortBy(_.stageId).lastOption
          .map(_.name).getOrElse("?")
        val j = Job(d, e.time)
        jobs.put(e.jobId, j)
        e.stageIds.foreach(s => stageToJob.put(s, e.jobId))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.t1 = e.time
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val jid = stageToJob.get(e.stageId)
        val j = jobs.get(jid)
        if (j != null && e.taskMetrics != null) {
          j.synchronized { j.tasks += 1; j.runMs += e.taskMetrics.executorRunTime }
        }
      }
    })

    // warmup (same shape as Bench)
    try {
      graft.SparkEntry.queries("q03_topk")(spark, sfDir).count()
    } catch { case _: Throwable => () }

    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("q136_neardup_audit"))
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "1").toInt
    val detail = sys.env.getOrElse("SPARK_GRAFT_PROBE_DETAIL", "1") == "1"
    for (name <- names) {
      // cold run (codegen/planning) untimed — profile the WARM rep,
      // matching the bench's min-of-N methodology
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext)
      var wall = Double.MaxValue
      val walls = (1 to reps).map { _ =>
        jobs.clear(); stageToJob.clear()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir).count()
        val w = (System.nanoTime() - t0) / 1e9
        org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext)
        wall = math.min(wall, w)
        import scala.jdk.CollectionConverters._
        val run = jobs.asScala.valuesIterator.map(_.runMs).sum / 1e3
        (w, run)
      }
      println(s"[$name] walls " +
        walls.map { case (w, r) => f"$w%.2f/$r%.1f" }.mkString(" ") +
        f"  min $wall%.2f  minRun ${walls.map(_._2).min}%.1f")
      if (!detail) { () } else {
      import scala.jdk.CollectionConverters._
      val js = jobs.asScala.toSeq.sortBy(_._1)
      println(s"\n=== $name  wall ${f"$wall%.2f"} s  jobs ${js.size} ===")
      var prevEnd = 0L
      var sumJob = 0.0; var sumGap = 0.0
      for ((id, j) <- js) {
        val w = (j.t1 - j.t0) / 1e3
        val gap = if (prevEnd == 0) 0.0 else (j.t0 - prevEnd) / 1e3
        prevEnd = j.t1
        sumJob += w; sumGap += math.max(gap, 0)
        println(f"job $id%3d  wall $w%6.3f  gap $gap%6.3f  tasks ${j.tasks}%4d  run ${j.runMs / 1e3}%7.2f  ${j.desc.take(110)}")
      }
      println(f"[$name] entry wall $wall%.2f = jobs $sumJob%.2f + inter-job gaps $sumGap%.2f + tail")
      }
    }
    spark.stop()
  }
}
