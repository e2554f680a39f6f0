package graft

import java.nio.file.Files

import graft.pipeline.TranscriptGen

/** One-off diagnostic for the local-cluster scaling protocol: raw
  * (no clock parity, no pinning) trials at 1 vs 4 forked 2-core executor
  * JVMs on the same input, with the per-stage wall / fetch-wait / GC
  * diagnostics that [[ScaleBench.runOnce]] prints. Not part of the round
  * artifacts — a measurement tool only.
  *
  * Usage: runMain graft.ScaleDiag [turns] [pairs]
  */
object ScaleDiag {
  def main(args: Array[String]): Unit = {
    val turns = args.lift(0).map(_.toLong).getOrElse(4000000L)
    val pairs = args.lift(1).map(_.toInt).getOrElse(2)
    val root = Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "graft_diag").toString
    locally {
      val s = org.apache.spark.sql.SparkSession.builder()
        .master("local[8]").appName("graft-diag-gen")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .getOrCreate()
      TranscriptGen.transcripts(s, turns).repartition(32)
        .write.parquet(s"$root/input")
      TranscriptGen.transcripts(s, math.max(250000L, turns / 4))
        .repartition(16).write.parquet(s"$root/warm")
      s.stop()
    }
    val width = 80
    (1 to pairs).foreach { i =>
      ScaleBench.awaitQuiet(60000, 2.5)
      val warm = if (sys.env.get("GRAFT_DIAG_FULLWARM").contains("1"))
        s"$root/input" else s"$root/warm"
      val t2 = ScaleBench.runOnce(2, s"$root/input", s"$root/out-2-$i", turns,
        parity = false, shuffleParts = width, execs = Some(1),
        warmInput = Some(warm))
      val t8 = ScaleBench.runOnce(8, s"$root/input", s"$root/out-8-$i", turns,
        parity = false, shuffleParts = width, execs = Some(4),
        warmInput = Some(warm))
      println(f"[diag] pair $i: tput2=${t2.tput.round} tput8=${t8.tput.round} " +
        f"wallEff=${(t8.tput / t2.tput) / 4}%.3f cpuEff=${t2.cpuSec / t8.cpuSec}%.3f")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }
}
