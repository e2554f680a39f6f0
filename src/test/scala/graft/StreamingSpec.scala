package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.model.PipelineConfig
import graft.pipeline.{Pipeline, TranscriptGen, Transcripts}
import graft.streaming.StreamingPipeline

/** Streaming/batch parity: the same transform over the same rows must
  * produce identical per-sink counts whether run as a batch job or as a
  * file-source stream; custom state survives across micro-batches.
  */
class StreamingSpec extends SparkSpec {

  private val N = 3000L

  test("windowed per-sink counts: stream equals batch") {
    val in = Files.createTempDirectory("graft_stream").toString + "/input"
    TranscriptGen.transcripts(spark, N).write.parquet(in)
    val cfg = PipelineConfig.default(in, "", Transcripts.RunTsMillis)

    val streamed = StreamingPipeline
      .runWindowedOnce(spark, in, cfg, "stream_counts")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    val batch = Pipeline
      .transform(spark.read.parquet(in), cfg,
        graft.enrich.Enrich.defaultLookup(spark))
      .groupBy(window(col("ts"), "1 hour"), col("sink"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start"), col("sink"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("mapGroupsWithState accumulates per-conversation state across batches") {
    val root = Files.createTempDirectory("graft_state").toString
    val in = s"$root/input"
    // two files -> with maxFilesPerTrigger=8 both fit one batch; write 20
    // small files so state must carry across several micro-batches
    TranscriptGen.transcripts(spark, N).repartition(20).write.parquet(in)
    val cfg = PipelineConfig.default(in, "", Transcripts.RunTsMillis)

    val progress = StreamingPipeline
      .conversationProgress(StreamingPipeline.routedStream(spark, in, cfg))
    val q = progress.writeStream
      .format("memory").queryName("conv_progress")
      .outputMode(OutputMode.Update)
      .start()
    q.processAllAvailable()
    q.stop()

    // latest state per conversation must equal the batch ground truth
    val got = spark.table("conv_progress")
      .groupBy("conv_id")
      .agg(max(col("turns")).as("turns"), max(col("max_turn")).as("max_turn"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val expected = spark.read.parquet(in)
      .groupBy("conv_id")
      .agg(count(lit(1)).as("turns"), max(col("turn_idx")).as("max_turn"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === expected)
  }

  test("streaming dropDuplicates restores exactly-once from re-delivered input") {
    val root = Files.createTempDirectory("graft_dedup").toString
    val in = s"$root/input"
    val base = TranscriptGen.transcripts(spark, N)
    base.coalesce(4).write.parquet(in)
    // plant an at-least-once re-delivery: every 5th row arrives again
    val dup = base.filter(pmod(col("turn_idx"), lit(5)) === 0)
    dup.coalesce(1).write.mode("append").parquet(in)
    val nDup = dup.count()
    assert(nDup > 0, "fixture must actually re-deliver rows")
    val cfg = PipelineConfig.default(in, "", Transcripts.RunTsMillis)

    val deduped = StreamingPipeline
      .runDedupOnce(spark, in, cfg, "stream_dedup_spec")
    // input carries the duplicates; the deduped stream must not
    assert(spark.read.parquet(in).count() === N + nDup)
    assert(deduped.count() === N)
    // and the per-sink counts must equal the duplicate-free batch transform
    val got = deduped.groupBy("sink").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val want = Pipeline
      .transform(base, cfg, graft.enrich.Enrich.defaultLookup(spark))
      .groupBy("sink").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === want)
  }
}
