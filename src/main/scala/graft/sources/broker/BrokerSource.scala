package graft.sources.broker

import java.util

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.core.MqttEntry

/** In-memory message broker standing in for the reference's MQTT topic
  * (lambda-sample `sensors/power`, mqtt/Producer.scala:72-73): producers
  * `publish` MqttEntry messages; the DSv2 [[BrokerSourceProvider]]
  * consumes them as offset-tracked micro-batches.
  *
  * This is the real connector shape a production MQTT source uses
  * (SURVEY S1: "real MQTT would be a DSv2 MicroBatchStream"): offsets
  * are monotone positions in the topic, each micro-batch reads the
  * (start, end] slice exactly once, and the rows ship INSIDE the input
  * partition so the reader works wherever the task runs. Only the
  * broker itself is process-local — swap [[Broker]] for a client to a
  * real broker and nothing else changes.
  */
object Broker {
  private val buf = ArrayBuffer[MqttEntry]()
  def publish(entries: MqttEntry*): Unit = synchronized { buf ++= entries }
  def slice(from: Int, until: Int): Seq[MqttEntry] = synchronized {
    buf.slice(from, until).toList
  }
  def size: Int = synchronized(buf.size)
  def clear(): Unit = synchronized(buf.clear())

  val schema: StructType = StructType(Seq(
    StructField("sensor", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("anomaly", IntegerType, nullable = false)))
}

class BrokerSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = Broker.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = new BrokerTable
}

class BrokerTable extends Table with SupportsRead {
  override def name(): String = "graft_broker"
  override def schema(): StructType = Broker.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = Broker.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new BrokerMicroBatchStream
    }
}

case class BrokerOffset(pos: Int) extends Offset {
  override def json(): String = pos.toString
}

/** One partition per micro-batch, carrying its message slice. */
case class BrokerPartition(rows: Seq[MqttEntry]) extends InputPartition

class BrokerMicroBatchStream extends MicroBatchStream {
  override def latestOffset(): Offset = BrokerOffset(Broker.size)
  override def initialOffset(): Offset = BrokerOffset(0)
  override def deserializeOffset(json: String): Offset = BrokerOffset(json.toInt)
  override def commit(end: Offset): Unit = () // broker retains; a real one would ack
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[BrokerOffset].pos, end.asInstanceOf[BrokerOffset].pos)
    Array(BrokerPartition(Broker.slice(s, e)))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => new PartitionReader[InternalRow] {
      private val it = partition.asInstanceOf[BrokerPartition].rows.iterator
      private var current: MqttEntry = _
      override def next(): Boolean = { val has = it.hasNext; if (has) current = it.next(); has }
      override def get(): InternalRow = new GenericInternalRow(Array[Any](
        UTF8String.fromString(current.sensor), current.value, current.anomaly))
      override def close(): Unit = ()
    }
}
