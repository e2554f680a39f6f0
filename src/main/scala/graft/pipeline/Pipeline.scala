package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.enrich.Enrich
import graft.functions.GraftFunctions
import graft.model.PipelineConfig
import graft.parse.PatternDictionary
import graft.route.Router
import graft.state.ManifestStore

/** End-to-end parse → enrich → route → aggregate job (the reference's route
  * pipeline, log-ship/src/main.rs:155-211, re-expressed as one declarative
  * plan per sink):
  *
  *   scan → dictionary parse (WholeStageCodegen) → broadcast enrich →
  *   sink tag projection → per-sink filtered write (dynamic partition
  *   overwrite, manifest-gated) → per-sink aggregates + lineage metrics.
  *
  * Scale design (100 TB / 1000 executors):
  *   - the fact side is never shuffled for the enrich join (broadcast);
  *   - the only shuffle is the salted repartition before the ordered sink
  *     write: key = (bucket, salt(turn_idx)) so a single giant conversation
  *     spreads across `saltBuckets` tasks while `bucket` (pure function of
  *     conv_id) keeps manifest granularity deterministic;
  *   - parse-once fan-out: the routed frame is persisted and each sink
  *     filters it (the reference reuses one configured input across routes,
  *     site/docs/config.md:355-358);
  *   - resume skips committed (sink, bucket) pairs via the manifest, so a
  *     rerun after failure reprocesses only missing buckets.
  */
object Pipeline {

  final case class SinkReport(sink: String, rows: Long, buckets: Int, wallMs: Long,
      skippedBuckets: Int)
  final case class RunReport(totalRows: Long, sinks: Seq[SinkReport], wallMs: Long) {
    def turnsPerSec: Double = if (wallMs == 0) 0 else totalRows * 1000.0 / wallMs
  }

  /** Pure transform part (no IO): parse + enrich + route tag. */
  def transform(input: DataFrame, cfg: PipelineConfig, lookup: DataFrame): DataFrame = {
    GraftFunctions.ensureRegistered(input.sparkSession)
    val parsed = PatternDictionary.parse(input, cfg.runTsMillis)
    val enriched = Enrich.withLookup(parsed, lookup)
    Router.route(enriched, cfg)
      .withColumn("bucket", pmod(hash(col("conv_id")), lit(cfg.saltBuckets)).cast("int"))
  }

  def run(spark: SparkSession, cfg: PipelineConfig): RunReport = {
    cfg.validate().left.foreach(err => throw new IllegalArgumentException(err))
    GraftFunctions.ensureRegistered(spark)
    val t0 = System.nanoTime()

    val input = spark.read.parquet(cfg.inputPath)
    val routed = transform(input, cfg, Enrich.defaultLookup(spark))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val manifest = new ManifestStore(spark, s"${cfg.outputRoot}/_manifest")
    val allSinks = cfg.sinks.map(_.name) ++ Seq(cfg.defaultSink, cfg.quarantineSink)

    val reports = allSinks.map { sink =>
      val s0 = System.nanoTime()
      val done = manifest.committedBuckets(sink)
      val sinkDf = routed.filter(col("sink") === sink)
      val todo =
        if (done.isEmpty) sinkDf
        else sinkDf.filter(!col("bucket").isin(done.toSeq: _*))

      // per-bucket lineage counts (tiny result: <= saltBuckets rows)
      val bucketRows = todo.groupBy("bucket").count()
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq

      if (bucketRows.nonEmpty) {
        todo
          // leading `bucket` satisfies the planned write's required
          // ordering (partitionBy sorts by partition cols, NON-stably —
          // without it the writer's own sort would scramble row order)
          .repartition(cfg.shufflePartitions, col("bucket"), pmod(col("turn_idx"), lit(4)))
          .sortWithinPartitions("bucket", "conv_id", "turn_idx")
          .select(col("conv_id"), col("turn_idx"), col("role"), col("tool"),
            col("ts"), col("format"), col("fields"), col("role_kind"),
            col("tool_category"), col("bucket"))
          .write
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("bucket")
          .mode(SaveMode.Overwrite)
          .parquet(s"${cfg.outputRoot}/sink=$sink")
      }
      val wallMs = (System.nanoTime() - s0) / 1000000
      if (bucketRows.nonEmpty)
        manifest.commit(cfg.runId, sink, bucketRows, wallMs, cfg.runTsMillis)
      SinkReport(sink, bucketRows.map(_._2).sum, bucketRows.size, wallMs, done.size)
    }

    // per-sink delivery aggregates (the reference's counters) to a table,
    // with an Observation riding the same action for plan-level totals
    val obs = org.apache.spark.sql.Observation(s"agg-${cfg.runId}")
    Router.sinkAggregates(routed)
      .observe(obs, sum(col("n")).as("rows_total"),
        sum(when(col("format") === "malformed", col("n")).otherwise(0L)).as("rows_malformed"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"${cfg.outputRoot}/_aggregates")
    val observed = obs.get

    routed.unpersist()
    val wallMs = (System.nanoTime() - t0) / 1000000

    // per-sink throughput/lineage metrics table — the Spark form of the
    // reference's rate logs (speed.rs:54-60, unix_socket.rs:82-85)
    {
      import spark.implicits._
      reports.map(r => (cfg.runId, r.sink, r.rows, r.buckets, r.skippedBuckets,
          r.wallMs, if (r.wallMs == 0) 0.0 else r.rows * 1000.0 / r.wallMs,
          observed.getOrElse("rows_total", 0L).asInstanceOf[Long],
          observed.getOrElse("rows_malformed", 0L).asInstanceOf[Long]))
        .toDF("run_id", "sink", "rows", "buckets", "skipped_buckets",
          "wall_ms", "rows_per_sec", "observed_total", "observed_malformed")
        .coalesce(1)
        .write.mode(SaveMode.Append).parquet(s"${cfg.outputRoot}/_metrics")
    }

    RunReport(reports.map(_.rows).sum, reports, wallMs)
  }
}
