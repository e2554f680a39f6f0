package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.model.PipelineConfig
import graft.pipeline.{Pipeline, TranscriptGen, Transcripts}

/** N vs 4N scaling evidence for BENCH/BASELINE.md (sandbox protocol in
  * BASELINE.md): the FULL disk-to-disk pipeline (read parquet -> parse ->
  * enrich -> route -> per-sink ordered writes + manifest + metrics) runs on
  * the identical input at local[N] and local[4N]; reports turns/sec at both
  * and efficiency (tput_4N / tput_N) / 4.
  *
  * Usage: runMain graft.ScaleBench [turns] [nSmall] [nBig]
  */
object ScaleBench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-scale-$cpus")
      .config("spark.sql.shuffle.partitions", (cpus * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def runOnce(cpus: Int, input: String, out: String, turns: Long): Double = {
    val spark = session(cpus)
    val cfg = PipelineConfig.default(input, out, Transcripts.RunTsMillis)
      .copy(shufflePartitions = cpus * 2, saltBuckets = 64, runId = s"scale-$cpus")
    val report = Pipeline.run(spark, cfg)
    require(report.totalRows == turns, s"expected $turns rows, got ${report.totalRows}")
    spark.stop()
    report.turnsPerSec
  }

  def main(args: Array[String]): Unit = {
    val turns = args.lift(0).map(_.toLong).getOrElse(4000000L)
    val nSmall = args.lift(1).map(_.toInt).getOrElse(8)
    val nBig = args.lift(2).map(_.toInt).getOrElse(32)
    val root = Files.createTempDirectory("graft_scale").toString

    // identical input for both levels, written once
    val gen = session(nBig)
    TranscriptGen.transcripts(gen, turns)
      .repartition(nBig * 4) // enough splits that local[8] and local[32] both parallelize
      .write.parquet(s"$root/input")
    gen.stop()

    val tputSmall = runOnce(nSmall, s"$root/input", s"$root/out$nSmall", turns)
    val tputBig = runOnce(nBig, s"$root/input", s"$root/out$nBig", turns)
    val eff = (tputBig / tputSmall) / (nBig.toDouble / nSmall)

    val md =
      s"""# BENCH/BASELINE.md — N vs 4N scaling evidence
         |
         |Protocol (BASELINE.md): identical disk-to-disk pipeline job
         |(scan -> dictionary parse -> broadcast enrich -> route -> per-sink
         |ordered parquet writes + manifest + aggregates + metrics) on the
         |identical ${turns} -turn input, two local parallelism levels, same
         |JVM heap, AQE on, shuffle partitions scaled with cores.
         |
         || level | cores | turns/sec |
         ||---|---|---|
         || N | $nSmall | ${tputSmall.round} |
         || 4N | $nBig | ${tputBig.round} |
         |
         |**scaling efficiency = (tput_4N / tput_N) / 4 = ${f"$eff%.3f"}**
         |(pass bar: >= 0.8)
         |
         |Input: deterministic synthetic transcripts (TranscriptGen, seedless
         |closed-form columns, FIXTURES.md mix incl. 1% heavy conversations
         |at 100x turns). Generated ${java.time.Instant.now()}.
         |""".stripMargin
    Files.createDirectories(Paths.get("BENCH"))
    Files.writeString(Paths.get("BENCH/BASELINE.md"), md)
    println(md)
  }
}
