package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** OP-4 streaming twin as a first-class DataSource V2 micro-batch source
  * (SURVEY.md §2.9): the reference's TelemetryThread poll loop
  * (etl_controller.py:576-613) re-expressed as a Spark streaming source.
  * Each poll emits the STATUS/MATRIX/CHASSIS frame triple; the "device"
  * is a deterministic simulation whose routing state evolves per poll
  * (route o ← (o·7 + poll) mod numInputs + 1), so downstream state
  * operators can be asserted against the model.
  *
  * Options: numOutputs (default 4), numInputs (8), pollsPerBatch (2),
  * maxPolls (10 — bounds processAllAvailable), intervalUs (2_000_000, the
  * reference's 2 s default poll period as event-time spacing).
  *
  * Usage: spark.readStream.format(classOf[TelemetrySourceProvider].getName)
  *   .option("numOutputs", 8).load()
  */
class TelemetrySourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TelemetrySource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TelemetryTable(new CaseInsensitiveStringMap(properties))
}

object TelemetrySource {
  val schema: StructType = StructType(Seq(
    StructField("ts_us", LongType),
    StructField("kind", StringType),
    StructField("raw", StringType)))

  /** Deterministic device model: route of output o at poll i. */
  def routeAt(o: Int, poll: Long, numInputs: Int): Int =
    ((o * 7 + poll) % numInputs).toInt + 1

  def statusFrame(poll: Long, numOutputs: Int, numInputs: Int): String =
    (1 to numOutputs).map(o => routeAt(o, poll, numInputs))
      .mkString("{BASTATUS,", ",", "}")
}

class TelemetryTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = "graft_telemetry"
  override def schema(): StructType = TelemetrySource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = TelemetrySource.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new TelemetryMicroBatchStream(
          opts.getInt("numOutputs", 4), opts.getInt("numInputs", 8),
          opts.getInt("pollsPerBatch", 2), opts.getInt("maxPolls", 10),
          opts.getLong("intervalUs", 2000000L),
          Option(opts.get("host")), opts.getInt("port", 4000))
    }
}

case class PollOffset(polls: Long) extends Offset {
  override def json(): String = polls.toString
}

class TelemetryMicroBatchStream(
    numOutputs: Int, numInputs: Int, pollsPerBatch: Int, maxPolls: Int,
    intervalUs: Long, host: Option[String] = None, port: Int = 4000)
    extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset = PollOffset(0)

  /** Stateless, restart-correct offset advance: computed from the start
    * offset Spark passes (a stateful no-arg latestOffset rewinds after a
    * checkpoint restore and duplicates batches).
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    PollOffset(math.min(start.asInstanceOf[PollOffset].polls + pollsPerBatch, maxPolls.toLong))

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is used via SupportsAdmissionControl")

  override def deserializeOffset(json: String): Offset = PollOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    Array(TelemetryRange(
      start.asInstanceOf[PollOffset].polls, end.asInstanceOf[PollOffset].polls,
      numOutputs, numInputs, intervalUs, host, port))

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val r = partition.asInstanceOf[TelemetryRange]
      new PartitionReader[InternalRow] {
        /** Simulated device when no host is configured; otherwise one
          * `{AB?}` status poll per offset over a real TCP round trip
          * (etl_controller.py:555-556 → :421-461). Offsets count polls, so
          * a task retry re-polls the device — the poll is a read-only
          * query, so replay is harmless (and is exactly what the
          * reference's poll loop does every 2 s anyway). A dead or silent
          * device yields no row for that poll rather than failing the
          * batch.
          */
        private val frames: Iterator[(Long, String, String)] =
          r.host match {
            case Some(h) =>
              lazy val transport = new DeviceTransport(h, r.port)
              (r.startPoll until r.endPoll).iterator.flatMap { i =>
                val ts = i * r.intervalUs
                transport(WireProtocol.commandFrame("AB?"))
                  .map(reply => (ts, "STATUS", reply))
              }
            case None =>
              (r.startPoll until r.endPoll).iterator.flatMap { i =>
                val ts = i * r.intervalUs
                Seq(
                  (ts, "STATUS", TelemetrySource.statusFrame(i, r.numOutputs, r.numInputs)),
                  (ts, "MATRIX", s"{BAcM,00,00,M$i}"),
                  (ts, "CHASSIS", s"{BAcC,00,00,OSO+${300 + i % 100}O+300O+291OOO2046${i % 10}O}"))
              }
          }
        private var current: (Long, String, String) = _
        override def next(): Boolean = {
          if (frames.hasNext) { current = frames.next(); true } else false
        }
        override def get(): InternalRow =
          InternalRow(current._1, UTF8String.fromString(current._2), UTF8String.fromString(current._3))
        override def close(): Unit = ()
      }
    }
}

case class TelemetryRange(
    startPoll: Long, endPoll: Long, numOutputs: Int, numInputs: Int,
    intervalUs: Long, host: Option[String] = None, port: Int = 4000)
    extends InputPartition
