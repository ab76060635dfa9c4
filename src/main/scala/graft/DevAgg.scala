package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev-only: attribute q13's cost — scan vs double-sum vs decimal-sum. */
object DevAgg {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = Tables.lineitem(spark, sfDir)

    def time(tag: String)(f: => Unit): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[agg] $tag%-34s median=${ts(2)}%6.3f min=${ts.head}%6.3f")
    }

    time("count only") {
      li.groupBy("l_returnflag", "l_linestatus").count()
        .write.format("noop").mode("overwrite").save()
    }
    time("double sums") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity"), sum("l_extendedprice"), avg("l_discount"),
             count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    time("decimal(18,2) sums") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity").cast(DecimalType(18, 2))),
             sum(col("l_extendedprice").cast(DecimalType(18, 2))),
             avg("l_discount"), count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    time("long-cents sums") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(round(col("l_quantity") * 100).cast(LongType)),
             sum(round(col("l_extendedprice") * 100).cast(LongType)),
             avg("l_discount"), count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    time("decimal-cast long-cents") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum((col("l_quantity").cast(DecimalType(18, 2)) * 100).cast(LongType)),
             sum((col("l_extendedprice").cast(DecimalType(18, 2)) * 100).cast(LongType)),
             avg("l_discount"), count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    time("full q13 as declared") {
      SparkEntry.queries("q13_tpch_q1")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
