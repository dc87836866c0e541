package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs (one per suite, lazy). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  val sf: String = "/root/testdata/sf0.001"

  /** Scratch dir for spec fixtures, deleted recursively at JVM exit so
    * repeated test runs don't accumulate parquet under /tmp. */
  def specTempDir(prefix: String): String = SparkSpec.tempDir(prefix)
}

object SparkSpec {
  private val cleanupRegistered = new java.util.concurrent.atomic.AtomicBoolean
  private val tempDirs =
    java.util.Collections.synchronizedList(new java.util.ArrayList[java.nio.file.Path])

  def tempDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    tempDirs.add(p)
    if (cleanupRegistered.compareAndSet(false, true)) {
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import scala.jdk.CollectionConverters._
        tempDirs.asScala.foreach { root =>
          try {
            java.nio.file.Files.walk(root).sorted(
              java.util.Comparator.reverseOrder[java.nio.file.Path]())
              .forEach(f => f.toFile.delete())
          } catch { case _: Throwable => () }
        }
      }))
    }
    p.toString
  }

  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-spec")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.debug.maxToStringFields", "100")
      .config("spark.sql.maxMetadataStringLength", "1000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
