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

/** One extracted field of a config-declared format: 1-based capture `group`
  * of the format regex, emitted under `name`; `cast` = "string" (raw group)
  * or "long" (try_cast — garbage degrades to an absent key, never throws).
  */
final case class FieldSpec(name: String, group: Int, cast: String = "string")

/** Timestamp recipe of a config-declared format, emitted as the `t` field:
  * capture `group` parsed with java.time `pattern` (empty pattern = the
  * group already carries an epoch number), emitted in `unit`
  * ("millis"|"seconds"); unparseable values fall back to the injected run
  * clock iff `fallbackRunClock` (the reference's Local::now() fallback,
  * fortinet.rs:103, made deterministic).
  */
final case class TsSpec(group: Int, pattern: String = "",
    unit: String = "millis", fallbackRunClock: Boolean = true)

/** A DICTIONARY ENTRY DECLARED IN CONFIG — the Spark analogue of the
  * reference's name→plugin factory registry (log-ship/src/main.rs:115-137 +
  * config_file.rs:45-77 TOML bindings), where a new format ships as a
  * Python script + a config line, no recompile. Here a new format ships as
  * data: PatternDictionary compiles each spec into the same gated + hoisted
  * Column trees as the built-in entries (one regex execution per row,
  * fused into the parse stage's WholeStageCodegen). Config formats are
  * tried AFTER the built-ins, in declaration order, and only on rows no
  * earlier entry claimed.
  *
  * @param gatePrefix  cheap `startsWith` gate — the regex never runs on a
  *   row failing it (the per-row cost that dominates at 10^12 turns)
  * @param gateContains cheap `contains` gate, AND-ed with gatePrefix
  */
final case class FormatSpec(
    name: String,
    regex: String,
    fields: Seq[FieldSpec],
    ts: Option[TsSpec] = None,
    gatePrefix: Option[String] = None,
    gateContains: Option[String] = None)

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
    runId: String = "run-0",
    formats: Seq[FormatSpec] = Nil
) {
  /** Mirrors config_file.rs:32-80 sanity_check: non-empty routes, unique
    * resolvable names, bounds on tunables, and compile-time validation of
    * every config-declared format (regex compiles, group references in
    * bounds, known casts/units) — fail at plan-build time, never per-row.
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
    else formats.view.flatMap(validateFormat).headOption match {
      case Some(err) => Left(err)
      case None =>
        val names = formats.map(_.name)
        val reserved = graft.parse.PatternDictionary.Formats :+ "malformed"
        if (names.distinct.size != names.size)
          Left(s"duplicate format names: ${names.mkString(",")}")
        else if (names.exists(reserved.contains))
          Left(s"format names collide with built-in dictionary entries: " +
            names.filter(reserved.contains).mkString(","))
        else Right(this)
    }
  }

  private def validateFormat(f: FormatSpec): Option[String] = {
    val compiled =
      try Right(java.util.regex.Pattern.compile(f.regex))
      catch { case e: java.util.regex.PatternSyntaxException =>
        Left(s"format '${f.name}': bad regex: ${e.getMessage}") }
    compiled match {
      case Left(err) => Some(err)
      case Right(p) =>
        val maxGroup = (f.fields.map(_.group) ++ f.ts.map(_.group)).maxOption.getOrElse(0)
        if (f.name.isEmpty) Some("format name must be non-empty")
        else if (f.fields.isEmpty && f.ts.isEmpty)
          Some(s"format '${f.name}': declares no fields")
        else if ((f.fields.map(_.group) ++ f.ts.map(_.group)).exists(_ < 1))
          Some(s"format '${f.name}': capture groups are 1-based")
        else if (maxGroup > p.matcher("").groupCount())
          Some(s"format '${f.name}': field group $maxGroup exceeds the " +
            s"regex's ${p.matcher("").groupCount()} capture groups")
        else if (f.fields.map(_.name).distinct.size != f.fields.size ||
            (f.ts.nonEmpty && f.fields.exists(_.name == "t")))
          Some(s"format '${f.name}': duplicate field names")
        else if (!f.fields.forall(x => x.cast == "string" || x.cast == "long"))
          Some(s"format '${f.name}': cast must be string|long")
        else if (!f.ts.forall(t => t.unit == "millis" || t.unit == "seconds"))
          Some(s"format '${f.name}': ts unit must be millis|seconds")
        else None
    }
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
