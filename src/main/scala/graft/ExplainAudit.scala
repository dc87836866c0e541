package graft
import org.apache.spark.sql.SparkSession
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    for (q <- args) {
      println(s"=========== $q ===========")
      val df = SparkEntry.queries(q)(spark, sf)
      df.queryExecution.toRdd.count()
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Exchange") || l.contains("Scan") || l.contains("Join") ||
          l.contains("Window") || l.contains("WholeStageCodegen") || l.contains("Generate"))
        .map(_.take(150)).mkString("\n"))
    }
    spark.stop()
  }
}
