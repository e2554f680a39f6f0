package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.enrich.Enrich
import graft.functions.GraftFunctions
import graft.parse.PatternDictionary
import graft.pipeline.{PipelineQueries, Pipeline, TranscriptGen}

/** Stage-by-stage throughput breakdown of the parse pipeline (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(4000000L)
    val cpus = args.lift(1).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.ensureRegistered(spark)

    val inputPath = java.nio.file.Files.createTempDirectory("prof").toString + "/in"
    TranscriptGen.transcripts(spark, n).write.parquet(inputPath)
    val input = spark.read.parquet(inputPath)
    val cfg = PipelineQueries.e2eConfig

    def measure(name: String, df: DataFrame): Unit = {
      def run(): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        n / ((System.nanoTime() - t0) / 1e9)
      }
      run(); run()
      val ts = Seq(run(), run(), run()).map(_.round)
      println(f"$name%-22s ${ts.max}%9d t/s  (trials ${ts.mkString(", ")})")
    }

    val text = col("text")
    measure("scan_only", input)
    measure("scan+fortinet_rlike", input.withColumn("x", PatternDictionary.isFortinet(text)))
    measure("scan+format_tag", input.withColumn("x",
      when(PatternDictionary.isFortinet(text), "fortinet")
        .when(PatternDictionary.isSyslog(text), "syslog")
        .when(PatternDictionary.isCombined(text), "combined")
        .when(PatternDictionary.isError(text), "error")
        .when(PatternDictionary.isKern(text), "kern")
        .when(PatternDictionary.isJson(text), "json")
        .when(PatternDictionary.isMini(text), "mini")
        .otherwise("malformed")))
    measure("scan+parse(full)", PatternDictionary.parse(input, 0L))
    measure("parse+enrich", Enrich.withLookup(PatternDictionary.parse(input, 0L),
      Enrich.defaultLookup(spark)))
    measure("full_transform", Pipeline.transform(input, cfg, Enrich.defaultLookup(spark)))
    spark.stop()
  }
}
