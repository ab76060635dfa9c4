package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** S17 bounded status log: last-N retention across appends, newest-first
  * order, generation pruning, and the top-k (no global sort) plan shape.
  */
class StatusLogSpec extends SparkSpec {
  import spark.implicits._

  private def entries(from: Int, n: Int) =
    (from until from + n).map(i =>
      (new Timestamp(1700000000000L + i * 1000L), "info", s"step $i"))
      .toDF("ts", "level", "message")

  test("append rotates to the newest `retain` rows across appends") {
    val dir = java.nio.file.Files.createTempDirectory("graft_statuslog").toString
    StatusLog.append(spark, dir, entries(0, 30), retain = 50)
    assert(StatusLog.read(spark, dir).count() === 30)
    StatusLog.append(spark, dir, entries(30, 30), retain = 50)
    val log = StatusLog.read(spark, dir)
    assert(log.count() === 50) // rotated: 60 appended, newest 50 retained
    val msgs = log.orderBy(col("ts").desc).select("message").as[String].collect()
    assert(msgs.head === "step 59") // newest survives
    assert(!msgs.contains("step 5")) // oldest 10 rotated out
    // exactly one generation directory remains after pruning
    val gens = new java.io.File(dir).listFiles().filter(_.getName.startsWith("gen_"))
    assert(gens.length === 1)
  }

  test("rotation is the top-k plan shape, not a global sort") {
    val dir = java.nio.file.Files.createTempDirectory("graft_statuslog2").toString
    StatusLog.append(spark, dir, entries(0, 10))
    val plan = StatusLog.read(spark, dir)
      .unionByName(entries(10, 5))
      .orderBy(col("ts").desc, col("level"), col("message")).limit(50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
