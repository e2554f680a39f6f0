package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

import graft.model.PipelineConfig
import graft.pipeline.{Pipeline, TranscriptGen, Transcripts}
import graft.state.ManifestStore

/** End-to-end pipeline behavior: per-sink counts vs a scalar oracle,
  * routed-row ordering, manifest resume idempotence (the partition-level
  * analogue of the reference's state-file resume test, file.rs:738-813).
  */
class PipelineSpec extends SparkSpec {

  private val N = 5000L

  private def freshDirs(): (String, String) = {
    val root = Files.createTempDirectory("graft_pipe").toString
    (s"$root/input", s"$root/out")
  }

  /** Scalar oracle: sink assignment per turn id, straight reimplementation
    * of the route semantics over a local range (test-scale only).
    */
  private def expectedSinks(n: Long): Map[String, Long] =
    (0L until n).map { id =>
      (id % 8, id % 3) match {
        case (7, _) => "quarantine"
        case (0, r) => if (r != 0) "utm" else "other"
        case (2, _) => "access"
        case (m, _) if m == 1 || m == 3 || m == 4 => "system"
        case _ => "other"
      }
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("e2e: per-sink delivery counts match the scalar oracle") {
    val (in, out) = freshDirs()
    TranscriptGen.transcripts(spark, N).write.parquet(in)
    val cfg = PipelineConfig.default(in, out, Transcripts.RunTsMillis)
    val report = Pipeline.run(spark, cfg)

    assert(report.totalRows === N)
    val expected = expectedSinks(N)
    report.sinks.foreach { s =>
      assert(s.rows === expected.getOrElse(s.sink, 0L), s"sink ${s.sink}")
    }
    // aggregates table agrees
    val aggs = spark.read.parquet(s"$out/_aggregates")
      .groupBy("sink").agg(sum("n").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(aggs === expected)
  }

  test("e2e: routed rows are ordered by (conv_id, turn_idx) within files") {
    val (in, out) = freshDirs()
    TranscriptGen.transcripts(spark, N).write.parquet(in)
    val cfg = PipelineConfig.default(in, out, Transcripts.RunTsMillis)
    Pipeline.run(spark, cfg)

    val rows = spark.read.parquet(s"$out/data/sink=system")
      .select(input_file_name().as("f"), col("conv_id"), col("turn_idx"))
      .collect()
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val seq = rs.map(r => (r.getString(1), r.getInt(2))).toSeq
      assert(seq === seq.sorted, "rows within a file must be sorted")
    }
  }

  test("resume: committed buckets are skipped; rerun never duplicates") {
    val (in, out) = freshDirs()
    TranscriptGen.transcripts(spark, N).write.parquet(in)
    val cfg = PipelineConfig.default(in, out, Transcripts.RunTsMillis)

    val first = Pipeline.run(spark, cfg)
    assert(first.totalRows === N)

    // rerun: everything committed -> zero new rows, no duplicates on disk
    val second = Pipeline.run(spark, cfg)
    assert(second.totalRows === 0L)
    second.sinks.foreach(s => assert(s.skippedBuckets > 0, s"sink ${s.sink}"))
    val onDisk = first.sinks.map(s =>
      spark.read.parquet(s"$out/data/sink=${s.sink}").count()).sum
    assert(onDisk === N)
  }

  test("resume: a partially-committed sink reprocesses only missing buckets") {
    val (in, out) = freshDirs()
    TranscriptGen.transcripts(spark, N).write.parquet(in)
    val cfg = PipelineConfig.default(in, out, Transcripts.RunTsMillis)

    // pre-commit buckets 0..3 for sink 'system' (simulates a crash after
    // those buckets' data+manifest committed, before the rest)
    val manifest = new ManifestStore(spark, s"$out/_manifest")
    manifest.commit(cfg.runId, "system", Seq((0, 0L), (1, 0L), (2, 0L), (3, 0L)),
      wallMs = 0L, committedAt = cfg.runTsMillis)

    val report = Pipeline.run(spark, cfg)
    val sys = report.sinks.find(_.sink === "system").get
    assert(sys.skippedBuckets === 4)
    assert(sys.buckets === cfg.saltBuckets - 4)
    // rows written = expected minus rows living in pre-committed buckets
    val expectedSystem = expectedSinks(N)("system")
    assert(sys.rows < expectedSystem && sys.rows > 0)
  }
}
