package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Dev-only: per-query job/stage attribution under the BENCH config and
  * methodology (clearCache between reps, noop sink) — which jobs a query
  * submits, how long each takes, and where the wall time goes. The r17
  * optimization round's empirical lens (guide §1.1) since the UI is off.
  *
  * args: [sfDir] name...
  */
object DevJobs {
  def main(args: Array[String]): Unit = {
    val (sfDir, names) =
      if (args.nonEmpty && args.head.startsWith("/"))
        (args.head, args.drop(1).toSeq)
      else ("/root/testdata/sf0.1", args.toSeq)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class J(id: Int, var start: Long = 0, var end: Long = 0,
                 var stages: Int = 0, var tasks: Int = 0,
                 var taskMs: Long = 0, var desc: String = "")
    val jobs = mutable.LinkedHashMap.empty[Int, J]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized {
          val j = jobs.getOrElseUpdate(e.jobId, J(e.jobId))
          j.start = e.time
          j.stages = e.stageInfos.size
          j.desc = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        jobs.synchronized {
          // stage→job attribution skipped; we count tasks globally per run
        }
    })

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        s
      }
      once() // warm (codegen/file index)
      once()
      jobs.synchronized(jobs.clear())
      val wall = once()
      Thread.sleep(300)
      val js = jobs.synchronized(jobs.values.toVector)
      val sumJob = js.map(j => (j.end - j.start).max(0)).sum
      println(f"[jobs] $name wall=${wall * 1000}%.0fms njobs=${js.size} " +
        f"nstages=${js.map(_.stages).sum} jobMsSum=$sumJob " +
        f"gapMs=${(wall * 1000 - sumJob)}%.0f")
      js.foreach { j =>
        println(f"  job=${j.id}%-4d ms=${(j.end - j.start).max(0)}%-6d " +
          f"stages=${j.stages}%-3d ${j.desc.take(90)}")
      }
    }
    spark.stop()
  }
}
