package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic, fully-distributed synthetic transcripts at arbitrary scale
  * (FIXTURES.md §1): built from `spark.range` with closed-form column
  * expressions — no driver-side data, no RNG state, so the same n yields the
  * same table on any cluster size (generation itself scales with executors).
  *
  * Skew: the first `n/100` conversations are "heavy" with 100x the turns of
  * a normal conversation (FIXTURES.md: exercises the salted repartition).
  */
object TranscriptGen {

  val NormalTurns = 20L
  val HeavyTurns: Long = NormalTurns * 100

  /** events-shaped frame (event_id, ts, user_id, event_type, value) of n
    * rows; `user_id` is the skewed conversation index.
    */
  def events(spark: SparkSession, n: Long): DataFrame = {
    val nHeavy = math.max(1L, n / 100L / HeavyTurns) // ~1% of turns in heavy convs
    val heavyTotal = nHeavy * HeavyTurns
    val id = col("id")
    val conv = when(id < heavyTotal, id.divide(HeavyTurns).cast("long"))
      .otherwise(lit(nHeavy) + ((id - heavyTotal).divide(NormalTurns)).cast("long"))
    // 4 splits per core: fine-grained tasks even out stragglers without
    // measurable scheduling overhead (each task is still >= 10^4 rows)
    val slices = spark.sparkContext.defaultParallelism * 4
    spark.range(0, n, 1, slices).select(
      id.as("event_id"),
      // 2024-01-01T00:00:00Z + one second per turn, wraps within the year
      timestamp_seconds(lit(1704067200L) + pmod(id, lit(20000000L))).as("ts"),
      conv.as("user_id"),
      when(pmod(id, lit(4)) === 0, "click").when(pmod(id, lit(4)) === 1, "view")
        .when(pmod(id, lit(4)) === 2, "error").otherwise("purchase").as("event_type"),
      (pmod(id, lit(1000)).cast("double") / 7.0).as("value"))
  }

  /** Transcripts table of n turns with the FIXTURES.md §2 text-format mix. */
  def transcripts(spark: SparkSession, n: Long): DataFrame =
    Transcripts.fromEvents(events(spark, n))
}
