package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic transcripts table derived from the driver-provided `events`
  * parquet (TESTDATA.md) — no external data. Every derivation here is a pure
  * function of events columns so the DuckDB oracle can compute the EXPECTED
  * parse output directly from the base columns without reimplementing the
  * parsers (strong oracle: construction and parsing can't share a bug).
  *
  * text payload mix follows FIXTURES.md §2 (formats drawn from the
  * reference's production parsers); the format of row k is chosen by
  * `event_id % 8`.
  */
object Transcripts {

  /** Fixed run clock for determinism (reference uses wall-clock,
    * insert_ts.rs:82-87 / fortinet.rs:103 — replay equality demands an
    * injected clock). 2024-06-01T00:00:00Z, same year as the events data so
    * RFC3164 year resolution reconstructs the original ts.
    */
  val RunTsMillis: Long = 1717200000000L

  def events(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/events.parquet")

  // ---- shared derivations (mirrored 1:1 in the oracle SQL) ----

  private val K = col("event_id")
  private val U = col("user_id")
  private val E = col("event_type")

  def method: Column = when(E === "click", "GET")
    .when(E === "view", "POST")
    .when(E === "error", "DELETE")
    .otherwise("PUT")

  def status: Column = (lit(200) + pmod(K, lit(5)) * 100).cast("string")
  def sizeCol: Column = floor(abs(col("value")) * 100).cast("long")
  def userStr: Column = when(U % 3 === 0, "-").otherwise(concat(lit("u"), U))
  def hostStr: Column = concat(lit("h"), pmod(U, lit(50)))
  def level: Column = when(E === "error", "error")
    .when(E === "click", "notice")
    .when(E === "view", "info")
    .otherwise("warn")

  private def d(fmt: String): Column = date_format(col("ts"), fmt)

  def fortinetLine: Column = concat(
    lit("<190>date="), d("yyyy-MM-dd"), lit(" time="), d("HH:mm:ss"),
    lit(" devname=FGT"), U, lit(" devid=FGT"), U,
    lit(" logid="), K,
    lit(" type="), when(K % 3 === 0, "event").otherwise("utm"),
    lit(" subtype=app-ctrl level=information vd=\"root\" user=\"u"), U,
    lit("\" srcip=192.168.1."), pmod(U, lit(250)),
    lit(" srcport="), (lit(1024) + pmod(K, lit(60000))),
    lit(" dstport=443 proto=6 service=\"HTTPS\" action="),
    when(K % 7 === 0, "block").otherwise("pass"),
    lit(" msg=\""), E, lit(": SSL,\" apprisk=elevated"))

  /** Syslog mix covering the reference's full parse_syslog surface
    * (syslog.rs:22-97), variant by event_id % 5:
    *   0,1 — RFC3164, plain text body
    *   2   — RFC3164, JSON-object body (keys merged into the event)
    *   3   — RFC5424 with msg_id + structured data + plain body
    *   4   — RFC5424 with nil timestamp/hostname/procid (run-clock
    *         fallback) + JSON-object body
    */
  def syslogLine: Column = {
    val pri = pmod(K, lit(192))
    val jsonBody = concat(
      lit("{\"etype\": \""), E, lit("\", \"k\": \""), K, lit("\"}"))
    val plainBody = concat(lit("evt "), E, lit(" "), K)
    val m5 = pmod(K, lit(5))
    val rfc3164Head = concat(
      lit("<"), pri, lit(">"), d("MMM dd HH:mm:ss"),
      lit(" host"), U, lit(" app"), pmod(K, lit(7)),
      lit("["), pmod(K, lit(30000)), lit("]: "))
    when(m5 <= 1, concat(rfc3164Head, plainBody))
      .when(m5 === 2, concat(rfc3164Head, jsonBody))
      .when(m5 === 3, concat(
        lit("<"), pri, lit(">1 "), d("yyyy-MM-dd'T'HH:mm:ss'Z'"),
        lit(" host"), U, lit(" app"), pmod(K, lit(7)),
        lit(" "), pmod(K, lit(30000)), lit(" mid"), pmod(K, lit(9)),
        lit(" [exampleSDID@32473 iut=\""), pmod(K, lit(4)),
        lit("\" eventSource=\""), E, lit("\"] "), plainBody))
      .otherwise(concat(
        lit("<"), pri, lit(">1 - - app"), pmod(K, lit(7)),
        lit(" - mid"), pmod(K, lit(9)), lit(" - "), jsonBody))
  }

  /** Fortinet ROUTE input mix: 4/5 normal pri-prefixed lines, 1/5 with no
    * '>' at all — exercising the transform's parse_syslog fallback
    * (fortinet.rs:108-111; such lines get {t: run clock, +message: line}).
    */
  def fortinetRouteLine: Column =
    when(pmod(K, lit(5)) === 4, regexp_replace(fortinetLine, "^<190>", ""))
      .otherwise(fortinetLine)

  def combinedLine: Column = concat(
    hostStr, lit(" - "), userStr,
    lit(" ["), d("dd/MMM/yyyy:HH:mm:ss"), lit(" +0000] \""),
    method, lit(" /p/"), K, lit(" HTTP/1.1\" "), status, lit(" "), sizeCol,
    lit(" \""), when(K % 4 === 0, lit("-")).otherwise(concat(lit("http://r/"), pmod(K, lit(10)))),
    lit("\" \"Mozilla/5.0 (test)\""))

  def errorLine: Column = concat(
    lit("["), d("EEE MMM dd HH:mm:ss"), lit("."), d("SSSSSS"), lit(" "), d("yyyy"),
    lit("] [core:"), level, lit("] [pid "), pmod(K, lit(30000)),
    when(K % 2 === 0, concat(lit(":tid "), pmod(K, lit(500)))).otherwise(lit("")),
    lit("] "),
    when(K % 3 =!= 0,
      concat(lit("[client 10.0.0."), pmod(U, lit(250)), lit(":"),
        lit(1024) + pmod(K, lit(50000)), lit("] "))).otherwise(lit("")),
    lit("AH"), lpad(pmod(K, lit(100000)).cast("string"), 5, "0"),
    lit(": "), E, lit(" happened"))

  def kernLine: Column = concat(
    d("MMM d HH:mm:ss"), lit(" host"), U, lit(" kernel: ["), K, lit("."),
    lpad(pmod(K, lit(1000000)).cast("string"), 6, "0"),
    lit("] ACPI: "), E, lit(" stopped"))

  def jsonLine: Column = concat(
    lit("{\"etype\": \""), E, lit("\", \"k\": \""), K, lit("\"}"))

  def miniLine: Column = concat(method, lit(" /p/"), K, lit(" "), status)

  def malformedLine: Column = concat(lit("###"), K)

  /** The transcript envelope (input_hint schema) over events: one turn per
    * event, text by the format mix, conversation = user.
    */
  def transcripts(spark: SparkSession, sfDir: String): DataFrame =
    fromEvents(events(spark, sfDir))

  /** Same envelope over any events-shaped frame (event_id, ts, user_id,
    * event_type, value) — used by TranscriptGen for scaled synthetic data.
    * `textOverride` (a Column over the events columns) replaces the
    * standard format mix; the quarantine fuzz query uses it to plant
    * hostile lines inside the otherwise-normal envelope.
    */
  def fromEvents(ev: DataFrame, textOverride: Option[Column] = None): DataFrame = {
    val m = pmod(K, lit(8))
    val text = textOverride.getOrElse(when(m === 0, fortinetLine)
      .when(m === 1, syslogLine)
      .when(m === 2, combinedLine)
      .when(m === 3, errorLine)
      .when(m === 4, kernLine)
      .when(m === 5, jsonLine)
      .when(m === 6, miniLine)
      .otherwise(malformedLine))
    ev.select(
      concat(lit("conv-"), U).as("conv_id"),
      K.cast("int").as("turn_idx"),
      when(K % 4 === 0, "user").when(K % 4 === 1, "assistant")
        .when(K % 4 === 2, "tool").otherwise("system").as("role"),
      text.as("text"),
      when(K % 5 === 0, "none").when(K % 5 === 1, "bash")
        .when(K % 5 === 2, "search").when(K % 5 === 3, "browser")
        .otherwise("code").as("tool"),
      col("ts"))
  }

  /** Single-format text frames for the per-format parse queries: the raw
    * events columns are carried alongside so outputs can be keyed.
    */
  def withText(spark: SparkSession, sfDir: String, line: Column): DataFrame =
    events(spark, sfDir).withColumn("text", line)
}
