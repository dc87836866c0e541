package graft.operators

import graft.{GraftQuery, Tables, Exact}
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink format coverage beyond parquet: write → read-back → verify
  * through the DuckDB oracle over the ORIGINAL table, so the round trip
  * must be lossless. (The reference is read-only over APIs; an engine
  * that replaces it still needs materialization formats.) */
object Sinks {
  import Exact._

  private def roundTrip(s: SparkSession, d: String, format: String) = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_$format").toString
    val src = Tables.t(s, d, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    src.coalesce(4).write.mode(SaveMode.Overwrite)
      .option("header", "true").format(format).save(dir)
    val back = format match {
      case "csv" => s.read.schema(src.schema).option("header", "true").csv(dir)
      case _ => s.read.schema(src.schema).format(format).load(dir)
    }
    back.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sumd(d2(col("o_totalprice"))).as("total"),
        sum(col("o_custkey")).as("cust_sum"))
  }

  private val oracle =
    """SELECT o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
      |  CAST(SUM(o_custkey) AS BIGINT) AS cust_sum
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  val defs: Seq[GraftQuery] = Seq(
    GraftQuery("q_sink_csv", (s, d) => roundTrip(s, d, "csv"), Some(oracle)),
    GraftQuery("q_sink_json", (s, d) => roundTrip(s, d, "json"), Some(oracle))
  )
}
