package graft.model

import java.sql.Timestamp

/** Core data model for the transcripts pipeline.
  *
  * Schema fixed by the target contract (BASELINE.json input_hint); the
  * reference's analogue is the schemaless JSON event
  * (log-ship/src/event.rs:7-11) — here the envelope is typed and the
  * open-schema parsed payload lives in a `MapType(String,String)` column.
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp
)

/** Broadcast-side enrich lookup (role/tool -> metadata); the Spark form of
  * the reference's constant-insert enrichment (insert_field.rs / insert_ts.rs)
  * generalized to a keyed lookup per SURVEY.md §2.6 "Joins".
  */
final case class LookupRow(
    role: String,
    tool: String,
    role_kind: String,
    tool_category: String
)

/** One fan-out sink: rows whose routing tag matches `predicateSql` land in
  * sink `name`. Mirrors the reference's route blocks
  * (log-ship/src/config_file.rs:144-153) where one parsed stream feeds
  * multiple outputs.
  */
final case class SinkRule(name: String, predicateSql: String)

/** Validated pipeline configuration — the Spark analogue of the reference's
  * TOML `ConfigFile` + `sanity_check` (log-ship/src/config_file.rs:13-80):
  * fail fast at plan-build time, never at runtime.
  *
  * @param runTsMillis fixed run clock injected for determinism (the
  *   reference uses wall-clock in insert_ts.rs:82-87, which would break
  *   replay equality; see SURVEY.md §7.4.2)
  */
final case class PipelineConfig(
    inputPath: String,
    outputRoot: String,
    sinks: Seq[SinkRule],
    defaultSink: String = "other",
    quarantineSink: String = "quarantine",
    runTsMillis: Long = 0L,
    shufflePartitions: Int = 0, // 0 = derive from input size (bytes / 128 MB)
    saltBuckets: Int = 8,
    runId: String = "run-0"
) {
  /** Mirrors config_file.rs:32-80 sanity_check: non-empty routes, unique
    * resolvable names, bounds on tunables.
    */
  def validate(): Either[String, PipelineConfig] = {
    if (sinks.isEmpty) Left("at least one sink rule is required")
    else if (sinks.map(_.name).distinct.size != sinks.size)
      Left(s"duplicate sink names: ${sinks.map(_.name).mkString(",")}")
    else if (sinks.exists(s => s.name == defaultSink || s.name == quarantineSink))
      Left("sink rule names must not collide with default/quarantine sinks")
    else if (saltBuckets < 1 || saltBuckets > 4096)
      Left(s"saltBuckets out of range [1,4096]: $saltBuckets")
    else if (shufflePartitions < 0)
      Left(s"shufflePartitions must be >= 0 (0 = derive from input size): $shufflePartitions")
    else Right(this)
  }
}

object PipelineConfig {
  /** Default route set used by tests/bench: tag on the parsed format and
    * the fortinet `type` field — generalizes the reference's
    * one-input-many-routes fan-out (log-ship/src/main.rs:162-167).
    */
  def default(inputPath: String, outputRoot: String, runTsMillis: Long): PipelineConfig =
    PipelineConfig(
      inputPath = inputPath,
      outputRoot = outputRoot,
      sinks = Seq(
        SinkRule("utm", "fields['type'] = 'utm'"),
        SinkRule("access", "format = 'combined'"),
        SinkRule("system", "format = 'kern' OR format = 'syslog' OR format = 'error'")
      ),
      runTsMillis = runTsMillis
    )
}
