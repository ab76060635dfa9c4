package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session — Spark
  * sessions are expensive; suites must not stop() it).
  */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_warehouse").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.spark
  def sf0001: String = SparkSpec.sf0001
  def sf001: String = SparkSpec.sf001
}

/** Shared assertion helpers for spec code (kept out of SparkSpec so
  * suites can use them without inheriting the session).
  */
object SpecHelpers {
  /** The ONE spelling of the GK rank-window contract with ±1 slack
    * (review finding r11: the convention was hand-copied in three
    * suites): value v's rank interval in the sorted data is
    * [lt+1, le]; the target rank must fall inside it widened by one on
    * each side. At accuracy ≫ n this degenerates to exactness up to
    * GK's own rank rounding.
    */
  def gkRankHolds[T](sorted: Seq[T], v: T, target: Double)
                    (implicit ord: Ordering[T]): Boolean = {
    val lt = sorted.count(ord.lt(_, v))
    val le = sorted.count(ord.lteq(_, v))
    lt <= target && target <= le + 1
  }
}
