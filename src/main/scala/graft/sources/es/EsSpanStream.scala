package graft.sources.es

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.unsafe.types.UTF8String

/** Structured Streaming over the ES span index (extension — the reference
  * is batch-pull only, SURVEY §2.6/§7.5): `spark.readStream
  * .format("es-spans")` turns the index into a micro-batch source.
  *
  * Offset model: a single event-time watermark in span-`startTime` µs.
  * Each micro-batch covers the window `[start, end)` where `end` is the
  * max `startTime` currently in the index + 1 (one aggregation query);
  * within a batch the window is sliced across `slices` partitions exactly
  * like the batch scan, so executors scroll concurrently and ingest
  * parallelism is identical to the batch path.
  *
  * Semantics note, stated rather than hidden: spans INDEXED late with a
  * `startTime` below a committed offset are not re-read — the offset is
  * event-time, not ingest-time. Production indexes that backfill should
  * either stream on an ingest-time field (set `streamfield`-style mapping
  * at the index) or accept the same tail-loss a time-partitioned batch
  * re-scan would have. The downstream graft pipeline is watermark-based
  * and tolerates the bounded version of this by design.
  */
case class EsTimeOffset(us: Long) extends Offset {
  override def json(): String = us.toString
}

case class EsStreamPartition(sliceId: Int, maxSlices: Int, fromUs: Long,
    toUs: Long) extends InputPartition

class EsSpanMicroBatchStream(conf: EsScanConfig, startUs: Long)
    extends MicroBatchStream {
  @transient private lazy val client =
    EsClient.forName(conf.clientClass, conf.endpoint)

  override def initialOffset(): Offset = EsTimeOffset(startUs)

  /** One max-aggregation query; monotone even if the index is empty. */
  override def latestOffset(): Offset =
    EsTimeOffset(math.max(startUs, client.maxStartTimeUs(conf.index) + 1))

  override def deserializeOffset(json: String): Offset =
    EsTimeOffset(json.toLong)

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val f = start.asInstanceOf[EsTimeOffset].us
    val t = end.asInstanceOf[EsTimeOffset].us
    if (t <= f) Array.empty
    else {
      val n = math.max(1, conf.slices)
      (0 until n).map(i => EsStreamPartition(i, n, f, t))
        .toArray[InputPartition]
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    EsStreamReaderFactory(conf)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class EsStreamReaderFactory(conf: EsScanConfig)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new EsStreamSliceReader(conf, p.asInstanceOf[EsStreamPartition])
}

/** Sequential range-scroll within one slice of one micro-batch window. */
class EsStreamSliceReader(conf: EsScanConfig, part: EsStreamPartition)
    extends PartitionReader[InternalRow] {
  private lazy val client = EsClient.forName(conf.clientClass, conf.endpoint)
  private var (page, token) = client.openScrollRange(conf.index,
    part.sliceId, part.maxSlices, EsSpanTableProvider.MaxPageSize,
    part.fromUs, part.toUs)
  private var it: Iterator[String] = page.iterator
  private var current: String = _

  override def next(): Boolean = {
    while (!it.hasNext && token.nonEmpty) {
      val (p, t) = client.scroll(token)
      it = p.iterator; token = t
      if (p.isEmpty) return false
    }
    if (it.hasNext) { current = it.next(); true } else false
  }
  override def get(): InternalRow = InternalRow(UTF8String.fromString(current))
  override def close(): Unit =
    if (token != null && token.nonEmpty) client.clearScroll(token)
}
