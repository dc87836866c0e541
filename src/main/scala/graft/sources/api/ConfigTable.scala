package graft.sources.api

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The reference's config-table UX (test.sql:1-8):
  *
  *   CREATE TABLE aws_config(config TEXT);
  *   INSERT INTO aws_config(config) VALUES ('{"profile":"...", ...}');
  *
  * graft exposes `graft.<plugin>.config` — SELECT returns the current
  * connection config; INSERT applies each row as a new config (the DSv2
  * write commits on the driver, where the registry lives). */
case class ConfigTable(pluginAlias: String)
    extends Table with SupportsRead with SupportsWrite {

  override def name(): String = s"$pluginAlias.config"
  override def schema(): StructType =
    StructType(Seq(StructField("config", StringType, nullable = false)))
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)

  // ---- read: one row with the current effective config ----
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan with Batch {
        override def readSchema(): StructType = schema()
        override def toBatch: Batch = this
        override def planInputPartitions(): Array[InputPartition] =
          Array(ConfigPartition(currentJson))
        override def createReaderFactory(): PartitionReaderFactory =
          new PartitionReaderFactory {
            override def createReader(p: InputPartition): PartitionReader[InternalRow] =
              new PartitionReader[InternalRow] {
                private var done = false
                private val json = p.asInstanceOf[ConfigPartition].json
                override def next(): Boolean = if (done) false else { done = true; true }
                override def get(): InternalRow =
                  new GenericInternalRow(Array[Any](UTF8String.fromString(json)))
                override def close(): Unit = ()
              }
          }
      }
    }

  private def currentJson: String = {
    val c = PluginRegistry.config(pluginAlias)
    // Jackson serialization (not string interpolation): extra values
    // containing quotes/backslashes must stay valid JSON on read-back
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.createObjectNode()
    node.put("n", c.n)
    node.put("page_size", c.pageSize)
    c.extra.toSeq.sortBy(_._1).foreach { case (k, v) => node.put(k, v) }
    mapper.writeValueAsString(node)
  }

  // ---- write: INSERT applies each row as a connection config ----
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new BatchWrite {
          override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
            ConfigWriterFactory()
          override def commit(messages: Array[WriterCommitMessage]): Unit =
            messages.foreach {
              case ConfigsWritten(configs) =>
                configs.foreach(GraftConfigure.applyConfig(pluginAlias, _))
              case _ =>
            }
          override def abort(messages: Array[WriterCommitMessage]): Unit = ()
        }
      }
    }
}

case class ConfigPartition(json: String) extends InputPartition
case class ConfigsWritten(configs: Seq[String]) extends WriterCommitMessage

case class ConfigWriterFactory() extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = scala.collection.mutable.ArrayBuffer[String]()
      override def write(row: InternalRow): Unit = buf += row.getUTF8String(0).toString
      override def commit(): WriterCommitMessage = ConfigsWritten(buf.toSeq)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
