package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._
import graft.operators.SpanOps
import graft.sources.JaegerJsonSource
import graft.sources.jaeger.JaegerSource

/** Offline tests of the Jaeger DSv2 connector against a fixture-backed fake
  * client that emulates the server's 1500-trace response cap (forcing the
  * reader's adaptive bisection) and records every API call. */
class JaegerSourceSpec extends SparkTestBase {

  private def opts(cap: Int, partitions: Int = 4) = Map(
    "client" -> classOf[FixtureJaegerClient].getName,
    "partitions" -> partitions.toString,
    // fixture trace starts span 1700000000s..1700000280s (µs)
    "start" -> "1700000000000000",
    "end" -> "1700000300000000",
    "maxReturnable" -> cap.toString)

  test("DSv2 scan: all fixture traces arrive via partitioned fetch") {
    FixtureJaegerClient.reset(cap = 1500)
    val raw = JaegerSource.rawTraces(spark, "fake://jaeger", opts(1500))
    assert(raw.count() === 40)
    // partition-parallel: at least `partitions` API calls were made
    assert(FixtureJaegerClient.calls.size() >= 4)
  }

  test("DSv2 scan matches the file source end-to-end (summarize parity)") {
    FixtureJaegerClient.reset(cap = 1500)
    val viaApi = graft.operators.TraceOps.summarize(
      JaegerSource.rawTraces(spark, "fake://jaeger", opts(1500)))
      .drop("processes").collect().map(_.toString).sorted
    val viaFile = graft.operators.TraceOps.summarize(
      JaegerJsonSource.traces(spark, fixturePath))
      .drop("processes").collect().map(_.toString).sorted
    assert(viaApi.toSeq === viaFile.toSeq)
  }

  test("clipped responses trigger adaptive bisection but lose no traces") {
    // cap far below the per-partition trace count: every partition must
    // bisect repeatedly to drain its range
    FixtureJaegerClient.reset(cap = 3)
    val raw = JaegerSource.rawTraces(spark, "fake://jaeger",
      opts(cap = 3, partitions = 2))
    assert(raw.count() === 40)
    assert(FixtureJaegerClient.calls.size() > 10) // many bisected fetches
  }

  test("operation/mindur/maxdur/tags filters forward as API params") {
    // the reference DECLARES these params but raises UNIMPLEMENTED
    // (traceframe.py:60-73); the engine forwards them natively
    FixtureJaegerClient.reset(cap = 1500)
    JaegerSource.rawTraces(spark, "fake://jaeger",
      opts(1500) ++ Map("operation" -> "/checkout", "mindur" -> "100ms",
        "maxdur" -> "2s", "tags" -> """{"error":"true"}""")).count()
    import scala.jdk.CollectionConverters._
    val calls = FixtureJaegerClient.calls.asScala.filter(_.contains("/api/traces"))
    assert(calls.nonEmpty)
    assert(calls.forall(c => c.contains("operation=/checkout") &&
      c.contains("minDuration=100ms") && c.contains("maxDuration=2s") &&
      c.contains("""tags={"error":"true"}""")))
  }

  private def jaegerScanConf(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan.asInstanceOf[graft.sources.jaeger.JaegerScan].conf
    }.get

  test("Catalyst service filter pushes down to the API query") {
    FixtureJaegerClient.reset(cap = 1500)
    val df = JaegerSource.rawResponses(spark, "fake://jaeger", opts(1500))
      .filter(col("service") === "web")
    val conf = jaegerScanConf(df)
    assert(conf.pushed.nonEmpty) // pushedFilters reached the scan
    assert(conf.services === Seq(Some("web")))
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("service") == "web"))
    import scala.jdk.CollectionConverters._
    val calls = FixtureJaegerClient.calls.asScala.filter(_.contains("/api/traces"))
    assert(calls.nonEmpty && calls.forall(_.contains("service=web")))
  }

  test("Catalyst service IN pushes one fetch set per service (no dedup)") {
    FixtureJaegerClient.reset(cap = 1500)
    val df = JaegerSource.rawResponses(spark, "fake://jaeger", opts(1500))
      .filter(col("service").isin("web", "api"))
    val conf = jaegerScanConf(df)
    assert(conf.services.toSet === Set(Some("web"), Some("api")))
    val bySvc = df.collect().groupBy(_.getAs[String]("service"))
    // fake ignores the service param, so both fetch sets return all data:
    // the reference's documented per-service duplication semantics
    assert(bySvc.keySet === Set("web", "api"))
    import scala.jdk.CollectionConverters._
    val calls = FixtureJaegerClient.calls.asScala.filter(_.contains("/api/traces"))
    assert(calls.exists(_.contains("service=web")) &&
      calls.exists(_.contains("service=api")))
  }

  test("Catalyst start_us range filter narrows the fetch window") {
    FixtureJaegerClient.reset(cap = 1500)
    val lo = 1700000100000000L
    val hi = 1700000200000000L
    val df = JaegerSource.rawResponses(spark, "fake://jaeger", opts(1500))
      .filter(col("start_us") >= lo && col("start_us") < hi)
    val conf = jaegerScanConf(df)
    assert(conf.start === lo && conf.end === hi)
    // fixture serves only traces inside the requested window: narrowing
    // must cut the result strictly below the full 40
    val traces = df.select(explode(from_json(col("json"),
      graft.model.JaegerModel.apiResponseSchema).getField("data")).as("t"))
    val n = traces.count()
    assert(n > 0 && n < 40)
    import scala.jdk.CollectionConverters._
    val calls = FixtureJaegerClient.calls.asScala.filter(_.contains("/api/traces"))
    assert(calls.forall { c =>
      val s = "start=(\\d+)".r.findFirstMatchIn(c).get.group(1).toLong
      val e = "end=(\\d+)".r.findFirstMatchIn(c).get.group(1).toLong
      s >= lo && e <= hi
    })
  }

  test("Catalyst duration filter becomes minDuration/maxDuration params") {
    FixtureJaegerClient.reset(cap = 1500)
    val df = JaegerSource.rawResponses(spark, "fake://jaeger", opts(1500))
      .filter(col("duration_us") >= 100000L && col("duration_us") <= 2000000L)
    assert(df.collect().nonEmpty)
    import scala.jdk.CollectionConverters._
    val calls = FixtureJaegerClient.calls.asScala.filter(_.contains("/api/traces"))
    assert(calls.nonEmpty && calls.forall(c =>
      c.contains("minDuration=100000us") && c.contains("maxDuration=2000000us")))
  }

  test("conflicting service option + pushed equality plans an empty scan") {
    FixtureJaegerClient.reset(cap = 1500)
    val df = JaegerSource.rawResponses(spark, "fake://jaeger",
      opts(1500) + ("service" -> "db"))
      .filter(col("service") === "web")
    assert(df.count() === 0)
    import scala.jdk.CollectionConverters._
    // provably-empty: no API call should have been issued at all
    assert(FixtureJaegerClient.calls.asScala.forall(!_.contains("/api/traces")))
  }

  test("limit pushdown reaches the API request") {
    FixtureJaegerClient.reset(cap = 1500)
    val limited = JaegerSource.rawTraces(spark, "fake://jaeger",
      opts(1500) + ("limit" -> "5"))
    assert(limited.count() <= 5 * 4) // ≤ limit per partition
    import scala.jdk.CollectionConverters._
    assert(FixtureJaegerClient.calls.asScala.forall(_.contains("limit=5")))
  }

  test("spansForServices unions per-service fetches (no dedup, quirk parity)") {
    FixtureJaegerClient.reset(cap = 1500)
    val spans = JaegerSource.spansForServices(spark, "fake://jaeger",
      Seq("web", "api"), opts(1500))
    val all = SpanOps.flatten(
      JaegerSource.rawTraces(spark, "fake://jaeger", opts(1500)))
    // fake ignores the service param (returns everything), so two services
    // → exactly 2× the rows: the reference's documented duplication
    assert(spans.count() === 2 * all.count())
  }

  test("knownServices parses the catalog listing") {
    FixtureJaegerClient.reset(cap = 1500)
    val svcs = JaegerSource.knownServices("fake://jaeger",
      classOf[FixtureJaegerClient].getName)
    assert(svcs.contains("web") && svcs.contains("db"))
  }
}

/** Serves the bundled fixture over the JaegerClient interface. Filters by
  * the requested [start, end) µs range (on root/first span startTime),
  * clips to the configured cap (latest-first like a real server's recency
  * bias), and records every call. */
class FixtureJaegerClient extends graft.sources.jaeger.JaegerClient {
  import FixtureJaegerClient._

  override def get(path: String, params: Map[String, String]): String = {
    calls.add(path + "?" + params.toSeq.sorted.map(p => s"${p._1}=${p._2}")
      .mkString("&"))
    if (path.endsWith("/services")) {
      """{"data": ["web", "api", "auth", "db", "cache", "queue", "search", "billing"]}"""
    } else {
      val start = params("start").toLong
      val end = params("end").toLong
      val limit = math.min(params.get("limit").fold(Int.MaxValue)(_.toInt), cap)
      val mapper = new ObjectMapper()
      val all = fixtureTraces(mapper)
      val inRange = all.filter { t =>
        val spans = t.get("spans")
        spans.size() > 0 && {
          val st = spans.get(0).get("startTime").asLong()
          st >= start && st < end
        } || (spans.size() == 0 && start == 1700000000000000L)
      }
      def startOf(t: com.fasterxml.jackson.databind.JsonNode): Long = {
        val spans = t.get("spans")
        if (spans.size() == 0) Long.MinValue
        else spans.get(0).get("startTime").asLong()
      }
      val clipped = inRange.sortBy(startOf)(Ordering[Long].reverse).take(limit)
      val arr = mapper.createArrayNode()
      clipped.foreach(arr.add)
      val root = mapper.createObjectNode()
      root.set[com.fasterxml.jackson.databind.JsonNode]("data", arr)
      mapper.writeValueAsString(root)
    }
  }
}

object FixtureJaegerClient {
  val calls = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  @volatile var cap: Int = 1500
  def reset(cap: Int): Unit = { calls.clear(); this.cap = cap }

  private var cached: List[com.fasterxml.jackson.databind.JsonNode] = _
  def fixtureTraces(mapper: ObjectMapper): List[com.fasterxml.jackson.databind.JsonNode] =
    synchronized {
      if (cached == null) {
        val in = getClass.getResourceAsStream("/jaeger_fixture.json")
        val root = mapper.readTree(in)
        in.close()
        cached = (0 until root.size()).map(root.get).toList
      }
      cached
    }
}
