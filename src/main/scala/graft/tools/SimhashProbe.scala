package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Scratch diagnostic for the optimization round: stage-by-stage timing of
  * dedup_simhash's plan under the bench session shape, to see which join
  * leg carries the warm-pass cost. Not part of any gate.
  */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.ensureRegistered(spark)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val tokens = split(lower(trim(col("text"))), "\\s+")
    val dsh = docs.select(col("doc_id"),
        GraftFunctions.word_shingles(tokens, 3).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("shingle cache materialize")(dsh.count())
    val sig = dsh.select(col("doc_id"),
        GraftFunctions.simhash_multi(col("sh"), 9).as("sigs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("sig cache materialize")(sig.count())

    (1 to 2).foreach { rep =>
      val banded = sig.select(col("doc_id"),
        explode(GraftFunctions.simhash_band_keys(col("sigs"), 16)).as("bk"))
      val probed = sig.select(col("doc_id"),
        explode(GraftFunctions.simhash_probe_keys(col("sigs"), 16)).as("bk"))
      time(s"rep$rep banded count")(banded.count())
      time(s"rep$rep probed count")(probed.count())
      // mirror the query's orientation (probed left, banded right = build)
      val candidates = probed.as("y").join(banded.as("x"),
          col("x.bk") === col("y.bk") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("ia"), col("y.doc_id").as("ib"))
      val nc = time(s"rep$rep candidates count")(candidates.count())
      System.err.println(s"[probe] candidates = $nc")
      if (rep == 2) {
        val ce = candidates.groupBy().count()
        ce.collect()
        System.err.println("[probe] candidates final plan:\n" +
          ce.queryExecution.executedPlan.toString.take(4000))
      }
      val prefiltered = candidates
        .join(sig.select(col("doc_id").as("ia"), col("sigs").as("sa")), "ia")
        .join(sig.select(col("doc_id").as("ib"), col("sigs").as("sb")), "ib")
        .filter(GraftFunctions.hamming_total(col("sa"), col("sb")) <= 120)
        .select("ia", "ib").distinct()
      val np = time(s"rep$rep prefiltered distinct count")(prefiltered.count())
      System.err.println(s"[probe] prefiltered = $np")
      if (rep == 2) {
        val pe = prefiltered.groupBy().count()
        pe.collect()
        System.err.println("[probe] prefiltered final plan:\n" +
          pe.queryExecution.executedPlan.toString.take(6000))
      }
      time(s"rep$rep full query")(
        graft.SparkEntry.queries("dedup_simhash")(spark, dir).count())
    }
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
  }
}
