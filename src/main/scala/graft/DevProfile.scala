package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev-only: attribute a trivial query's wall time — how much is executor
  * task time vs scheduler/planning gaps (the per-query floor evidence in
  * BASELINE.md).
  */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args.lift(1).getOrElse("q02_docs_scan")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "32")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)

    val taskTime = new AtomicLong(0)   // sum of task run times (ms)
    val taskCount = new AtomicInteger(0)
    val jobCount = new AtomicInteger(0)
    val stageCount = new AtomicInteger(0)
    val schedDelay = new AtomicLong(0) // scheduler delay summed over tasks
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        taskTime.addAndGet(t.taskInfo.duration)
        taskCount.incrementAndGet()
        if (t.taskMetrics != null)
          schedDelay.addAndGet(
            t.taskInfo.duration - t.taskMetrics.executorRunTime)
      }
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobCount.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stageCount.incrementAndGet()
    })

    // warm up
    (1 to 2).foreach(_ => fn(spark, sfDir).write.format("noop").mode("overwrite").save())
    Thread.sleep(500)
    taskTime.set(0); taskCount.set(0); jobCount.set(0); stageCount.set(0); schedDelay.set(0)

    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val wallMs = (System.nanoTime() - t0) / 1e6
    Thread.sleep(500) // let listener drain
    println(f"[profile] $name wall=${wallMs}%.0fms jobs=${jobCount.get} " +
      f"stages=${stageCount.get} tasks=${taskCount.get} " +
      f"taskTimeSum=${taskTime.get}ms (parallel) " +
      f"nonExecutorOverheadInTasks=${schedDelay.get}ms " +
      f"driverGap≈${wallMs - taskTime.get / 32.0}%.0fms")
    spark.stop()
  }
}
