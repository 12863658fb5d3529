package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._
import graft.operators.TraceOps
import graft.sources.JaegerJsonSource
import graft.sources.es.{EsClient, EsSpanOps}

/** Offline tests of the es-spans DSv2 source: a fake client serves the
  * bundled fixture's spans as ES `_source` documents, hash-partitioned by
  * slice, paginated by scroll tokens. */
class EsSourceSpec extends SparkTestBase {

  private def opts = Map(
    "client" -> classOf[FixtureEsClient].getName,
    "slices" -> "4")

  test("sliced scroll scan returns every span exactly once") {
    FixtureEsClient.reset()
    val raw = spark.read.format("es-spans")
      .option("endpoint", "fake://es").options(opts).load()
    assert(raw.count() === 331)
    // pagination actually happened: more scroll continuations than slices
    assert(FixtureEsClient.scrollCalls.get() > 4)
  }

  test("traces_from_es pipeline matches the file-source summary") {
    FixtureEsClient.reset()
    val viaEs = EsSpanOps.traces(spark, "fake://es", opts)
      .select("traceID", "traceName", "nspans", "duration", "startTime")
      .collect().map(_.toString).sorted
    val viaFile = TraceOps.summarize(
      JaegerJsonSource.traces(spark, fixturePath))
      .select("traceID", "traceName", "nspans", "duration", "startTime")
      .collect().map(_.toString).sorted
    // ES path only sees traces that HAVE spans; file path also summarizes
    // the empty trace — align by dropping it
    val viaFileNonEmpty = viaFile.filterNot(_.contains("cc2883e37242fbb8"))
    assert(viaEs.toSeq === viaFileNonEmpty.toSeq)
  }

  test("micro-batch stream over the span index matches the batch scan") {
    FixtureEsClient.reset()
    val stream = spark.readStream.format("es-spans")
      .option("endpoint", "fake://es").options(opts).load()
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("es_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("es_stream")
    assert(got.count() === 331)
    val batch = spark.read.format("es-spans")
      .option("endpoint", "fake://es").options(opts).load()
    assert(got.except(batch).isEmpty && batch.except(got).isEmpty)
  }

  test("streaming read rejects the batch-only 'limit' option") {
    // the batch scan pushes `limit` down per slice; a micro-batch stream
    // is unbounded, so the same option silently meaning "no limit" on
    // the stream path would be a divergence — it fails fast instead
    FixtureEsClient.reset()
    val stream = spark.readStream.format("es-spans")
      .option("endpoint", "fake://es").option("limit", "5").options(opts)
      .load()
    val ex = intercept[Exception] {
      val q = stream.writeStream.outputMode("append")
        .format("memory").queryName("es_stream_limited")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex).exists(t => t.getMessage != null &&
      t.getMessage.contains("'limit' option applies only to batch")))
  }

  test("stream offsets window the index by startTime and slice in parallel") {
    import graft.sources.es.{EsScanConfig, EsSpanMicroBatchStream, EsTimeOffset}
    val conf = EsScanConfig("fake://es", classOf[FixtureEsClient].getName,
      "jaeger-span-*", slices = 3, limit = None)
    val s = new EsSpanMicroBatchStream(conf, startUs = 0L)
    val latest = s.latestOffset().asInstanceOf[EsTimeOffset].us
    assert(latest === FixtureEsClient.docsTs.map(_._1).max + 1)
    // split the full range at the median span time: the two windows must
    // partition the corpus exactly (each doc in exactly one window)
    val mid = FixtureEsClient.docsTs.map(_._1).sorted
      .apply(FixtureEsClient.docsTs.size / 2)
    def readAll(from: Long, to: Long): Seq[String] = {
      val parts = s.planInputPartitions(EsTimeOffset(from), EsTimeOffset(to))
      assert(parts.length === (if (to > from) 3 else 0))
      val fac = s.createReaderFactory()
      parts.flatMap { p =>
        val r = fac.createReader(p)
        val buf = Seq.newBuilder[String]
        while (r.next()) buf += r.get().getUTF8String(0).toString
        r.close(); buf.result()
      }.toSeq
    }
    val first = readAll(0L, mid)
    val second = readAll(mid, latest)
    assert(first.nonEmpty && second.nonEmpty)
    assert(first.size + second.size === 331)
    assert((first.toSet & second.toSet).isEmpty)
    // empty window plans zero partitions
    assert(readAll(latest, latest).isEmpty)
  }

  test("limit pushdown: full delivery despite slice skew, scrolls cleared") {
    FixtureEsClient.reset()
    val raw = spark.read.format("es-spans")
      .option("endpoint", "fake://es").options(opts)
      .option("limit", "40").load()
    // each slice caps at the FULL limit (per-slice shares under-deliver on
    // skewed slices); the retained Spark Limit trims to exactly n
    assert(raw.limit(40).count() === 40)
    val n = raw.count()
    assert(n > 0 && n <= 40 * 4)
    // early-stopping readers release their server-side scroll contexts
    assert(FixtureEsClient.clearCalls.get() > 0)
  }

  test("mid-stream scroll death: slice re-run recovers with no dup/loss") {
    // A scroll continuation that dies between pages of a micro-batch
    // window is deliberately NOT retried at the transport (the server
    // cursor advances while producing a response — re-issuing could skip
    // a page, HttpRetry scaladoc); the recovery unit is the Spark task
    // re-run, which re-opens the slice from scratch and discards the
    // failed attempt's output. Emulate exactly that contract: attempt 1
    // dies mid-scroll (output discarded), attempt 2 re-creates the
    // reader on the same partition. The window must arrive exactly —
    // nothing lost, nothing duplicated — and the dead attempt must
    // still release its server-side scroll context on close().
    import graft.sources.es.{EsScanConfig, EsSpanMicroBatchStream, EsTimeOffset}
    FixtureEsClient.reset()
    FailingEsClient.reset()
    val conf = EsScanConfig("fake://es", classOf[FailingEsClient].getName,
      "jaeger-span-*", slices = 2, limit = None)
    val s = new EsSpanMicroBatchStream(conf, startUs = 0L)
    val latest = s.latestOffset().asInstanceOf[EsTimeOffset].us
    val parts = s.planInputPartitions(EsTimeOffset(0L), EsTimeOffset(latest))
    val fac = s.createReaderFactory()
    FailingEsClient.failAtScroll.set(2) // die on the 2nd continuation
    var retried = 0
    val collected = Seq.newBuilder[String]
    parts.foreach { p =>
      def attempt(): Seq[String] = {
        val r = fac.createReader(p)
        try {
          val buf = Seq.newBuilder[String]
          while (r.next()) buf += r.get().getUTF8String(0).toString
          buf.result()
        } finally r.close()
      }
      collected ++= (try attempt() catch {
        case e: RuntimeException if e.getMessage.contains("died") =>
          retried += 1; attempt() // the task re-run
      })
    }
    val got = collected.result()
    assert(retried === 1) // the injected death actually hit a read path
    assert(got.size === 331 && got.toSet.size === 331)
    assert(got.toSet === FixtureEsClient.docs.toSet)
    // the failed attempt held a live scroll token and close() cleared it
    assert(FixtureEsClient.clearCalls.get() > 0)
  }

  test("scroll-open retry path checks the server scroll-context budget") {
    import graft.sources.es.EsScrollPressure
    // parses both node-stats spellings, summing across nodes
    val newStats = """{"nodes":{"a":{"indices":{"search":
      {"open_scroll_contexts":300}}},"b":{"indices":{"search":
      {"open_scroll_contexts":150}}}}}""".replace("\n", "")
    assert(EsScrollPressure.openContexts(newStats) === Some(450L))
    val oldStats = """{"nodes":{"a":{"indices":{"search":
      {"open_contexts":120}}}}}""".replace("\n", "")
    assert(EsScrollPressure.openContexts(oldStats) === Some(120L))
    // >= 80% of the cap warns; below stays quiet; absent field stays quiet
    assert(EsScrollPressure.check(newStats).isDefined)      // 450/500
    assert(EsScrollPressure.check(oldStats).isEmpty)        // 120/500
    assert(EsScrollPressure.check(newStats, cap = 1000).isEmpty)
    assert(EsScrollPressure.openContexts("""{"nodes":{}}""").isEmpty)
    assert(EsScrollPressure.check("""{"nodes":{}}""").isEmpty)
    // the warning names the pressure and the cap it is measured against
    val w = EsScrollPressure.check(newStats).get
    assert(w.contains("450") && w.contains("500"))
  }
}

/** Serves fixture spans as ES documents: deterministic slice partitioning
  * (spanID hash mod maxSlices), scroll tokens encode (slice, offset). */
class FixtureEsClient extends EsClient {
  import FixtureEsClient._

  override def openScroll(index: String, sliceId: Int, maxSlices: Int,
      pageSize: Int): (Seq[String], String) =
    pageFor(sliceId, maxSlices, 0, pageSize)

  override def scroll(token: String): (Seq[String], String) = {
    scrollCalls.incrementAndGet()
    token.split(":").map(_.toLong) match {
      case Array(s, m, off, ps) =>
        pageFor(s.toInt, m.toInt, off.toInt, ps.toInt)
      case Array(s, m, off, ps, f, t) =>
        pageFor(s.toInt, m.toInt, off.toInt, ps.toInt, Some((f, t)))
      case other => throw new IllegalArgumentException(
        s"bad token arity ${other.length}")
    }
  }

  override def clearScroll(token: String): Unit = {
    clearCalls.incrementAndGet()
  }

  override def openScrollRange(index: String, sliceId: Int, maxSlices: Int,
      pageSize: Int, fromUs: Long, toUs: Long): (Seq[String], String) =
    pageFor(sliceId, maxSlices, 0, pageSize, Some((fromUs, toUs)))

  override def maxStartTimeUs(index: String): Long =
    if (docsTs.isEmpty) -1L else docsTs.map(_._1).max

  private def pageFor(slice: Int, maxSlices: Int, offset: Int,
      pageSize: Int, range: Option[(Long, Long)] = None)
      : (Seq[String], String) = {
    val pool = range match {
      case Some((f, t)) =>
        docsTs.filter { case (ts, _) => ts >= f && ts < t }.map(_._2)
      case None => docs
    }
    val mine = pool.zipWithIndex
      .filter { case (_, i) => i % maxSlices == slice }.map(_._1)
    val page = mine.slice(offset, offset + math.min(pageSize, 25))
    val nextOff = offset + math.min(pageSize, 25)
    val rangeTok = range.map { case (f, t) => s":$f:$t" }.getOrElse("")
    val token =
      if (nextOff >= mine.size) ""
      else s"$slice:$maxSlices:$nextOff:$pageSize$rangeTok"
    (page, token)
  }
}

/** FixtureEsClient that kills the server on the Nth scroll continuation
  * (once): the mid-stream fault the task-retry recovery spec injects. */
class FailingEsClient extends FixtureEsClient {
  override def scroll(token: String): (Seq[String], String) = {
    if (FailingEsClient.failAtScroll.decrementAndGet() == 0)
      throw new RuntimeException("es node died mid-scroll")
    super.scroll(token)
  }
}

object FailingEsClient {
  val failAtScroll =
    new java.util.concurrent.atomic.AtomicInteger(Int.MaxValue)
  def reset(): Unit = failAtScroll.set(Int.MaxValue)
}

object FixtureEsClient {
  val scrollCalls = new java.util.concurrent.atomic.AtomicInteger(0)
  val clearCalls = new java.util.concurrent.atomic.AtomicInteger(0)
  def reset(): Unit = { scrollCalls.set(0); clearCalls.set(0) }

  /** Fixture spans re-rendered as ES `_source` docs (span + embedded
    * process, hostname tag drives the synthesized processID). */
  lazy val docs: Vector[String] = {
    val mapper = new ObjectMapper()
    val in = getClass.getResourceAsStream("/jaeger_fixture.json")
    val root = mapper.readTree(in)
    in.close()
    val out = Vector.newBuilder[String]
    (0 until root.size()).foreach { ti =>
      val trace = root.get(ti)
      val procs = trace.get("processes")
      val spans = trace.get("spans")
      (0 until spans.size()).foreach { si =>
        val span = spans.get(si).deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
        val pid = span.get("processID").asText()
        span.set[com.fasterxml.jackson.databind.JsonNode]("process",
          procs.get(pid))
        span.remove("processID")
        span.remove("logs")
        span.remove("warnings")
        out += mapper.writeValueAsString(span)
      }
    }
    out.result()
  }

  /** (startTime µs, doc) pairs behind the streaming range queries. */
  lazy val docsTs: Vector[(Long, String)] = {
    val mapper = new ObjectMapper()
    docs.map(d => (mapper.readTree(d).get("startTime").asLong(), d))
  }
}
