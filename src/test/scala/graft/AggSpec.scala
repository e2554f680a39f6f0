package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Pins the custom typed Aggregator: SimHash is order-invariant over the
  * token multiset, so the partial-mergeable vote aggregation must equal
  * the (group-materializing) collect_list + flatten + simhash64 path
  * bit-for-bit, independently of partitioning.
  */
class AggSpec extends SparkSpec {

  test("simhash_agg equals simhash64 over flattened collected tokens") {
    GraftFunctions.ensureRegistered(spark)
    val viaAgg = graft.pipeline.PipelineQueries.queries("pipe_conv_fingerprint")(
      spark, sf("0.001"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val viaExpr = graft.pipeline.Transcripts.transcripts(spark, sf("0.001"))
      .select(col("conv_id"), split(lower(trim(col("text"))), "\\s+").as("toks"))
      .groupBy("conv_id")
      .agg(GraftFunctions.simhash64(flatten(collect_list(col("toks"))), 0L).as("fp"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(viaAgg.nonEmpty)
    assert(viaAgg === viaExpr)
  }

  test("simhash_agg is stable under repartitioning") {
    val base = graft.pipeline.PipelineQueries.queries("pipe_conv_fingerprint")(
      spark, sf("0.001")).collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val shuffled = graft.pipeline.Transcripts.transcripts(spark, sf("0.001"))
      .repartition(13)
      .select(col("conv_id"), split(lower(trim(col("text"))), "\\s+").as("toks"))
    import shuffled.sparkSession.implicits._
    val again = shuffled.as[(String, Seq[String])]
      .groupByKey(_._1).mapValues(_._2)
      .agg(graft.functions.SimHashAgg.toColumn.name("fp"))
      .collect().map { case (k, v) => (k, v) }.toSet
    assert(again === base)
  }
}
