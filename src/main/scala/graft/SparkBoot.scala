package graft

import org.apache.spark.sql.SparkSession

/** Shared master-resolution + local-cluster executor bootstrap for the
  * CLI mains (review r16: Verify and Bench carried character-identical
  * copies of this block — a one-sided edit would silently give the two
  * entry points different executor environments, exactly the
  * divergence ClusterBoundarySpec exists to rule out).
  */
private[graft] object SparkBoot {

  /** `SPARK_GRAFT_MASTER` override, else in-JVM `local[cpus]`. The
    * cluster form (`local-cluster[N,C,M]`) runs REAL executor
    * processes — closure/broadcast serialization and result fetch get
    * priced instead of elided; callers must have
    * `SPARK_SCALA_VERSION=2.13` in the process env (the r13 recipe) or
    * the worker's executor launcher dies with "Cannot find any build
    * directories".
    */
  def master(cpus: String): String =
    sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")

  /** local-cluster executors are SEPARATE JVMs launched by the worker:
    * they need the application classes (this JVM's classpath — same
    * host, shared filesystem) and any caller-supplied JVM flags
    * (`SPARK_GRAFT_EXECUTOR_OPTS`; the worker's launcher injects
    * Spark's own JDK-17 --add-opens defaults). No-op for local[...]
    * masters.
    */
  def clusterize(builder: SparkSession.Builder,
                 master: String): SparkSession.Builder =
    if (!master.startsWith("local-cluster")) builder
    else builder
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.executor.extraJavaOptions",
        sys.env.getOrElse("SPARK_GRAFT_EXECUTOR_OPTS", ""))
}
