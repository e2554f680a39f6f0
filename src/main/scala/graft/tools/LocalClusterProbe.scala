package graft.tools

import org.apache.spark.sql.SparkSession

/** Feasibility probe for `local-cluster[n, coresEach, memMB]` — Spark's
  * real multi-executor standalone mode with FORKED executor JVMs (the
  * faithful local analogue of "N executors vs 4N executors": each executor
  * owns its heap, GC, and JIT, exactly like a cluster node, unlike
  * `local[n]` where all workers share one heap). Runs a shuffle job and a
  * pipeline smoke to verify executors launch with the sbt classpath.
  */
object LocalClusterProbe {
  def main(args: Array[String]): Unit = {
    val execs = args.lift(0).map(_.toInt).getOrElse(2)
    val cp = System.getProperty("java.class.path")
    val spark = SparkSession.builder()
      .master(s"local-cluster[$execs,2,2048]")
      .appName("graft-lc-probe")
      .config("spark.executor.extraClassPath", cp)
      .config("spark.executor.memory", "2g")
      // executor scratch dirs are resolved by the in-process Worker from
      // the PROCESS env (SPARK_LOCAL_DIRS, exported by build.sbt envVars);
      // session conf spark.local.dir and spark.executorEnv.* are both
      // ignored for this (verified via /proc/<executor>/environ)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sum = spark.range(0, 10000000, 1, 16)
      .selectExpr("sum(id) s").collect()(0).getLong(0)
    println(s"[probe] shuffle-free sum=$sum block-managers=" +
      spark.sparkContext.getExecutorMemoryStatus.size)
    val t0 = System.nanoTime()
    val df = graft.pipeline.TranscriptGen.transcripts(spark, 200000L)
    val routed = graft.pipeline.Pipeline.transform(df,
      graft.pipeline.PipelineQueries.e2eConfig,
      graft.enrich.Enrich.defaultLookup(spark))
    routed.write.format("noop").mode("overwrite").save()
    println(f"[probe] pipeline noop ok in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
