package graft.sources.jaeger

import java.util
import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.InternalRow

/** DataSource V2 "jaeger" format (SURVEY.md §4.2): distributed ingest from
  * the Jaeger HTTP API.
  *
  * The reference fetches sequentially and, on hitting the server's
  * 1500-trace cap, recursively bisects the time range — one synchronous
  * round trip per bisection (`/root/reference/traceframe/traceframe.py:55-136`).
  * Here the lookback window is pre-split into `partitions` sub-ranges, one
  * Spark input partition each, so executors fetch concurrently; *within* a
  * partition the reader still bisects adaptively when a response comes back
  * clipped, preserving the reference's completeness guarantee without its
  * serial latency.
  *
  * Pushdown: `SupportsPushDownLimit` caps the per-request `limit` the API is
  * asked for (the reference's limit forwarding, `traceframe.py:79-81`);
  * Spark re-applies the exact Limit above the scan.
  *
  * Catalyst filter pushdown (`SupportsPushDownFilters`): the schema carries
  * four *query-echo* columns — `service`, `operation`, `start_us`,
  * `duration_us` — whose DECLARED meaning is "the API query parameter this
  * row was fetched under" (null = parameter unset), exactly like a file
  * source's partition columns. Predicates on them translate to the API
  * params the reference always pushes (`traceframe.py:79-85`):
  *   - `service = 'x'` / `service IN (...)` → one fetch (partition set) per
  *     service; a trace matching several requested services appears once
  *     per service, the reference's own multi-service semantics
  *     (`traceframe.py:446-468` does not dedupe either);
  *   - `operation = 'x'` → the `operation` param;
  *   - `start_us` &lt;/≤/&gt;/≥ bounds → narrow the fetch time range (each
  *     row's echo value is its fetch sub-range start, so consumed bounds
  *     hold on the emitted rows by construction);
  *   - `duration_us` ≥/&gt; and ≤/&lt; bounds → `minDuration`/`maxDuration`.
  * Accepted shapes are consumed (not re-evaluated by Spark); anything else
  * (e.g. `service LIKE ...`) stays a residual filter evaluated over the
  * echo values under their provenance semantics. Conflicting pushed
  * equalities (`service = 'a'` after a `service` read option of 'b')
  * produce an empty scan, not a broken query.
  *
  * Each emitted row is one raw API response body (`json` string column);
  * [[JaegerSource]] parses it with `from_json` + explode into typed trace
  * rows. Parsing happens executor-side either way; keeping the scan schema
  * to a single string column keeps this connector on stable public APIs.
  *
  * Options: `endpoint` (required), `service`, `limit`, `start`/`end`
  * (µs since epoch; default = 14-day lookback, reference
  * `traceframe.py:19-21`), `operation`, `mindur`/`maxdur` (Jaeger
  * duration strings, e.g. "100ms"), `tags` (JSON object string) — the
  * params the reference DECLARES but raises UNIMPLEMENTED on
  * (`traceframe.py:60-73`), here forwarded natively as API query
  * parameters — `partitions` (default 8), `client` (implementation
  * class, default [[HttpJaegerClient]]).
  */
class JaegerTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "jaeger"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    JaegerTableProvider.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new JaegerTable(properties.asScala.toMap)
}

object JaegerTableProvider {
  /** `json` = one raw API response body; the rest are query-echo columns
    * (the API parameter each row was fetched under — null when unset). */
  val schema: StructType = StructType(Seq(
    StructField("json", StringType),
    StructField("service", StringType),
    StructField("operation", StringType),
    StructField("start_us", LongType),
    StructField("duration_us", LongType)))
  /** Jaeger's Badger-backend response cap (reference `traceframe.py:15-17`):
    * a response with this many traces must be assumed clipped. */
  val MaxTracesReturnable = 1500
  val DefaultLookbackMicros: Long = 14L * 24 * 3600 * 1000000 // 14 days
}

class JaegerTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String =
    s"jaeger:${props.getOrElse("endpoint", "?")}"
  override def schema(): StructType = JaegerTableProvider.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new JaegerScanBuilder(props ++ options.asScala)
}

class JaegerScanBuilder(rawOpts: Map[String, String])
    extends ScanBuilder with SupportsPushDownLimit with SupportsPushDownFilters {
  private val opts = rawOpts.map { case (k, v) => k.toLowerCase -> v }
  private var pushedLimit: Option[Int] = opts.get("limit").map(_.toInt)

  // pushdown state, merged with read options in build()
  private var accepted: Array[Filter] = Array.empty
  private var svcPushed: Option[Seq[String]] = None
  private var opPushed: Option[String] = None
  private var startLo: Option[Long] = None // inclusive
  private var startHi: Option[Long] = None // exclusive
  private var durLo: Option[Long] = None // inclusive µs
  private var durHi: Option[Long] = None // inclusive µs

  override def pushLimit(limit: Int): Boolean = {
    pushedLimit = Some(pushedLimit.fold(limit)(math.min(_, limit)))
    true // partial: the API's keep-last semantics aren't exact, Spark re-limits
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def narrow(cur: Option[Seq[String]], vs: Seq[String]) =
      Some(cur.fold(vs)(_.intersect(vs)))
    val residual = filters.filterNot {
      case EqualTo("service", v: String) =>
        svcPushed = narrow(svcPushed, Seq(v)); true
      case In("service", vs) if vs.forall(_.isInstanceOf[String]) =>
        svcPushed = narrow(svcPushed, vs.map(_.asInstanceOf[String]).toSeq)
        true
      case EqualTo("operation", v: String) =>
        // two different pushed operations → impossible → empty service set
        if (opPushed.exists(_ != v)) svcPushed = Some(Seq.empty)
        opPushed = Some(v); true
      case GreaterThanOrEqual("start_us", v: Long) =>
        startLo = Some(startLo.fold(v)(math.max(_, v))); true
      case GreaterThan("start_us", v: Long) =>
        startLo = Some(startLo.fold(v + 1)(math.max(_, v + 1))); true
      case LessThan("start_us", v: Long) =>
        startHi = Some(startHi.fold(v)(math.min(_, v))); true
      case LessThanOrEqual("start_us", v: Long) =>
        startHi = Some(startHi.fold(v + 1)(math.min(_, v + 1))); true
      case GreaterThanOrEqual("duration_us", v: Long) =>
        durLo = Some(durLo.fold(v)(math.max(_, v))); true
      case GreaterThan("duration_us", v: Long) =>
        durLo = Some(durLo.fold(v + 1)(math.max(_, v + 1))); true
      case LessThanOrEqual("duration_us", v: Long) =>
        durHi = Some(durHi.fold(v)(math.min(_, v))); true
      case LessThan("duration_us", v: Long) =>
        durHi = Some(durHi.fold(v - 1)(math.min(_, v - 1))); true
      case _ => false
    }
    accepted = filters.diff(residual)
    residual
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def build(): Scan = {
    val end0 = opts.get("end").map(_.toLong)
      .getOrElse(System.currentTimeMillis() * 1000)
    val start0 = opts.get("start").map(_.toLong)
      .getOrElse(end0 - JaegerTableProvider.DefaultLookbackMicros)
    val start = startLo.fold(start0)(math.max(start0, _))
    val end = startHi.fold(end0)(math.min(end0, _))
    // services: read option ∩ pushed equalities; Seq(None) = unfiltered
    // A pushed operation conflicting with the option operation can match
    // nothing: plan an empty scan rather than issuing doomed fetches.
    val opConflict = (opts.get("operation"), opPushed) match {
      case (Some(a), Some(b)) => a != b
      case _ => false
    }
    val services: Seq[Option[String]] =
      if (opConflict) Seq.empty
      else (opts.get("service"), svcPushed) match {
        case (None, None) => Seq(None)
        case (Some(s), None) => Seq(Some(s))
        case (None, Some(vs)) => vs.distinct.map(Some(_))
        case (Some(s), Some(vs)) =>
          if (vs.contains(s)) Seq(Some(s)) else Seq.empty
      }
    val operation = opPushed.orElse(opts.get("operation"))
    new JaegerScan(JaegerScanConfig(
      endpoint = opts.getOrElse("endpoint",
        throw new IllegalArgumentException("jaeger source needs 'endpoint'")),
      clientClass = opts.getOrElse("client",
        classOf[HttpJaegerClient].getName),
      services = services,
      operation = operation,
      // pushed duration bounds win over the option strings (the API takes
      // one param each; a µs bound is exact where "100ms" needs parsing)
      minDuration = durLo.map(v => s"${v}us").orElse(opts.get("mindur")),
      maxDuration = durHi.map(v => s"${v}us").orElse(opts.get("maxdur")),
      durationEcho = durLo.orElse(durHi),
      tags = opts.get("tags"),
      start = start,
      end = end,
      limit = pushedLimit,
      partitions = opts.getOrElse("partitions", "8").toInt,
      maxReturnable = opts.getOrElse("maxreturnable",
        JaegerTableProvider.MaxTracesReturnable.toString).toInt,
      pushed = accepted.map(_.toString).toSeq))
  }
}

case class JaegerScanConfig(endpoint: String, clientClass: String,
    /** the per-fetch service params: Seq(None) = one unfiltered fetch set,
      * Seq(Some(a), Some(b)) = one fetch set per service (pushed IN) */
    services: Seq[Option[String]], start: Long, end: Long, limit: Option[Int],
    partitions: Int,
    /** server response cap; overridable so tests can exercise bisection */
    maxReturnable: Int = JaegerTableProvider.MaxTracesReturnable,
    operation: Option[String] = None,
    minDuration: Option[String] = None,
    maxDuration: Option[String] = None,
    /** JSON object string, forwarded verbatim as the `tags` API param */
    tags: Option[String] = None,
    /** value emitted in the duration_us echo column (pushed bound) */
    durationEcho: Option[Long] = None,
    /** accepted pushed filters, rendered for plan/test introspection */
    pushed: Seq[String] = Nil)

case class JaegerInputPartition(service: Option[String], rangeStart: Long,
    rangeEnd: Long) extends InputPartition

class JaegerScan(val conf: JaegerScanConfig) extends Scan with Batch {
  override def readSchema(): StructType = JaegerTableProvider.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"JaegerScan endpoint=${conf.endpoint} " +
      s"PushedFilters: [${conf.pushed.mkString(", ")}]"

  /** One partition per (service, time sub-range) — the parallel form of
    * the reference's sequential bisection; an empty service set (provably
    * empty result after pushdown) plans zero partitions. */
  override def planInputPartitions(): Array[InputPartition] = {
    if (conf.services.isEmpty || conf.end <= conf.start)
      return Array.empty
    val n = math.max(1, conf.partitions)
    val width = math.max(1L, (conf.end - conf.start) / n)
    (for {
      svc <- conf.services
      i <- 0 until n
    } yield {
      val s = conf.start + i * width
      val e = if (i == n - 1) conf.end else math.min(s + width, conf.end)
      JaegerInputPartition(svc, s, e)
    }).filter(p => p.rangeEnd > p.rangeStart).toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new JaegerPartitionReaderFactory(conf)
}

class JaegerPartitionReaderFactory(conf: JaegerScanConfig)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new JaegerPartitionReader(conf, partition.asInstanceOf[JaegerInputPartition])
}

/** Executor-side reader: fetches its time sub-range, adaptively bisecting
  * (discard-and-split, like `traceframe.py:98-136`) whenever a response is
  * clipped at the server cap. Emits one row per final (unclipped) response
  * body. */
class JaegerPartitionReader(conf: JaegerScanConfig, part: JaegerInputPartition)
    extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private lazy val client = JaegerClient.forName(conf.clientClass, conf.endpoint)
  private lazy val bodies: Iterator[String] =
    fetch(part.rangeStart, part.rangeEnd, depth = 0).iterator
  private var current: String = _

  private def fetch(start: Long, end: Long, depth: Int): List[String] = {
    val params = Map(
      "start" -> start.toString,
      "end" -> end.toString,
      "limit" -> conf.limit.getOrElse(conf.maxReturnable).toString) ++
      part.service.map("service" -> _) ++
      conf.operation.map("operation" -> _) ++
      conf.minDuration.map("minDuration" -> _) ++
      conf.maxDuration.map("maxDuration" -> _) ++
      conf.tags.map("tags" -> _)
    val body = client.get("/api/traces", params)
    val nTraces = {
      val root = mapper.readTree(body)
      val data = root.get("data")
      if (data == null || data.isNull) 0 else data.size()
    }
    val clipped = nTraces >= conf.maxReturnable &&
      conf.limit.forall(_ > nTraces)
    if (clipped && depth < 20 && end - start > 1) {
      val mid = start + (end - start) / 2
      fetch(start, mid, depth + 1) ::: fetch(mid, end, depth + 1)
    } else {
      if (clipped)
        // the reference's bisection preserves completeness; if we hit the
        // recursion/width floor still clipped, the truncation must not be
        // invisible to the caller
        System.err.println(
          s"[jaeger] WARNING: response still clipped at $nTraces traces " +
            s"for range [$start,$end] at bisection floor (depth=$depth); " +
            "traces beyond the server cap are dropped")
      if (nTraces == 0) Nil else List(body)
    }
  }

  override def next(): Boolean =
    if (bodies.hasNext) { current = bodies.next(); true } else false

  /** Row = (json, query-echo columns): the echo values are the API params
    * this row was fetched under, satisfying every consumed pushed filter
    * by construction. */
  override def get(): InternalRow =
    InternalRow(
      UTF8String.fromString(current),
      part.service.map(UTF8String.fromString).orNull,
      conf.operation.map(UTF8String.fromString).orNull,
      java.lang.Long.valueOf(part.rangeStart),
      conf.durationEcho.map(java.lang.Long.valueOf).orNull)

  override def close(): Unit = ()
}
