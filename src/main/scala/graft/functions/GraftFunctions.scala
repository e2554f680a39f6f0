package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions.call_function

/** Session-scoped registration of graft's custom Catalyst expressions plus
  * Column-level wrappers. Registration is idempotent; every query builder
  * calls [[ensureRegistered]] before using the wrappers so the functions
  * are also reachable from `spark.sql(...)`.
  */
object GraftFunctions {

  private def builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "logfmt_parse" -> ((exprs: Seq[Expression]) => LogfmtParse(exprs.head)),
    // fortinet flavor: drop valueless keys, exclude date/time (stitched
    // separately into the ts field; fortinet.rs:78-105)
    "logfmt_parse_fortinet" -> ((exprs: Seq[Expression]) =>
      LogfmtParse(exprs.head, dropNullValues = true, excludeKeys = Seq("date", "time"))),
    // RFC5424 structured-data params: k="v" pairs are logfmt-compatible and
    // dropping valueless keys discards the bare SD-id tokens for free
    "logfmt_parse_sd" -> ((exprs: Seq[Expression]) =>
      LogfmtParse(exprs.head, dropNullValues = true)),
    "cosine_sim" -> ((exprs: Seq[Expression]) => CosineSim(exprs(0), exprs(1))),
    "fingerprint64" -> ((exprs: Seq[Expression]) => Fingerprint64(exprs.head)),
    // k is passed as a literal int expression
    "minhash_sig" -> ((exprs: Seq[Expression]) => MinHashSig(exprs(0),
      exprs(1).eval().asInstanceOf[Int])),
    "simhash64" -> ((exprs: Seq[Expression]) => SimHash64(exprs(0),
      exprs(1).eval() match { case i: Int => i.toLong; case l: Long => l })),
    "simhash_multi" -> ((exprs: Seq[Expression]) => SimHashMulti(exprs(0),
      exprs(1).eval().asInstanceOf[Int])),
    "rp_sign" -> ((exprs: Seq[Expression]) => RpSign(exprs(0),
      exprs(1).eval().asInstanceOf[Int], exprs(2).eval() match {
        case i: Int => i.toLong
        case l: Long => l
      })),
    "regexp_groups" -> ((exprs: Seq[Expression]) => RegexpGroups(exprs(0),
      exprs(1).eval().toString)),
    "compact_map" -> ((exprs: Seq[Expression]) => CompactMap(exprs)),
    "word_shingles" -> ((exprs: Seq[Expression]) => WordShingles(exprs(0),
      exprs(1).eval().asInstanceOf[Int])),
    "word_pairs" -> ((exprs: Seq[Expression]) => WordPairs(exprs(0))),
    "bpe_merge" -> ((exprs: Seq[Expression]) => BpeMerge(exprs(0),
      exprs(1).eval().toString, exprs(2).eval().toString)),
    "lumberjack_encode" -> ((exprs: Seq[Expression]) => LumberjackEncode(exprs.head)),
    "lumberjack_decode" -> ((exprs: Seq[Expression]) => LumberjackDecode(exprs.head)),
    "merge_maps" -> ((exprs: Seq[Expression]) => MergeMaps(exprs(0), exprs(1))),
    "merge_maps_field" -> ((exprs: Seq[Expression]) => MergeFieldMaps(exprs(0),
      exprs(1), exprs(2).eval().toString,
      exprs(3).eval().asInstanceOf[Boolean])),
    "simhash_band_keys" -> ((exprs: Seq[Expression]) => SimHashBandKeys(exprs(0),
      exprs(1).eval().asInstanceOf[Int])),
    "simhash_probe_keys" -> ((exprs: Seq[Expression]) => SimHashProbeKeys(exprs(0),
      exprs(1).eval().asInstanceOf[Int])),
    "minhash_band_keys" -> ((exprs: Seq[Expression]) => MinHashBandKeys(exprs(0),
      exprs(1).eval().asInstanceOf[Int])),
    "hamming_total" -> ((exprs: Seq[Expression]) => HammingTotal(exprs(0), exprs(1))),
    "match_count" -> ((exprs: Seq[Expression]) => MatchCount(exprs(0), exprs(1))),
    "json_flat_map" -> ((exprs: Seq[Expression]) => JsonFlatMap(exprs.head)),
    // centroid table arrives as a foldable array<array<float>> literal and
    // is baked into the expression at build time
    "nearest_cell" -> ((exprs: Seq[Expression]) => {
      val ad = exprs(1).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val cents = Array.tabulate(ad.numElements()) { i =>
        if (ad.isNullAt(i)) null
        else {
          val inner = ad.getArray(i)
          Array.tabulate(inner.numElements())(j => inner.getFloat(j))
        }
      }
      NearestCell(exprs(0), cents)
    }),
    // numeric-key list arrives as one csv literal
    "event_json" -> ((exprs: Seq[Expression]) => EventJson(exprs(0),
      exprs(1).eval().toString.split(',').toSeq.filter(_.nonEmpty))),
    "rp_project" -> ((exprs: Seq[Expression]) => RpProject(exprs(0),
      exprs(1).eval().asInstanceOf[Int], exprs(2).eval() match {
        case i: Int => i.toLong
        case l: Long => l
      }))
  )

  /** Idempotent AND once-per-session: re-registering on every query call
    * spammed "function X replaced a previously registered function" WARNs
    * into every driver artifact, so sessions that already have the last
    * builder registered are skipped.
    */
  def ensureRegistered(spark: SparkSession): Unit = synchronized {
    val reg = spark.sessionState.functionRegistry
    val sentinel = org.apache.spark.sql.catalyst.FunctionIdentifier(builders.last._1)
    if (!reg.functionExists(sentinel)) {
      builders.foreach { case (name, b) =>
        reg.createOrReplaceTempFunction(name, b, "built-in")
      }
    }
  }

  /** Parse a logfmt string column into map<string,string> (null values for
    * bare keys). Requires [[ensureRegistered]] on the session.
    */
  def logfmt_parse(c: Column): Column = call_function("logfmt_parse", c)

  /** Fortinet flavor: valueless keys dropped, date/time excluded. */
  def logfmt_parse_fortinet(c: Column): Column =
    call_function("logfmt_parse_fortinet", c)

  /** Structured-data flavor: valueless keys (bare SD ids) dropped. */
  def logfmt_parse_sd(c: Column): Column = call_function("logfmt_parse_sd", c)

  /** Distinct word n-gram shingles of an array<string> token column. */
  def word_shingles(c: Column, n: Int): Column =
    call_function("word_shingles", c, org.apache.spark.sql.functions.lit(n))

  /** ALL adjacent pairs (space-joined, with multiplicity) of array<string>. */
  def word_pairs(c: Column): Column = call_function("word_pairs", c)

  /** One greedy left-to-right BPE merge of (left, right) over array<string>. */
  def bpe_merge(c: Column, left: String, right: String): Column =
    call_function("bpe_merge", c, org.apache.spark.sql.functions.lit(left),
      org.apache.spark.sql.functions.lit(right))

  /** Lumberjack v2 frame from an array<string> of payloads (seq 1-based). */
  def lumberjack_encode(c: Column): Column = call_function("lumberjack_encode", c)

  /** Lumberjack v2 frame -> array<struct<seq:int,payload:string>> (null on
    * malformed bytes).
    */
  def lumberjack_decode(c: Column): Column = call_function("lumberjack_decode", c)

  /** Cosine similarity of two array<float> columns (double result). */
  def cosine_sim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)

  /** Stable 64-bit rolling-hash fingerprint of a string column. */
  def fingerprint64(c: Column): Column = call_function("fingerprint64", c)

  /** MinHash signature (array<long> of length k) of an array<string>. */
  def minhash_sig(c: Column, k: Int): Column =
    call_function("minhash_sig", c, org.apache.spark.sql.functions.lit(k))

  /** 64-bit SimHash of an array<string> token column (seeded). */
  def simhash64(c: Column, seed: Long = 0L): Column =
    call_function("simhash64", c, org.apache.spark.sql.functions.lit(seed))

  /** nSigs independent 64-bit SimHashes (array<long>) in one token pass. */
  def simhash_multi(c: Column, nSigs: Int): Column =
    call_function("simhash_multi", c, org.apache.spark.sql.functions.lit(nSigs))

  /** Encoded (band << bandBits | key) LSH band keys of a multi-simhash. */
  def simhash_band_keys(c: Column, bandBits: Int): Column =
    call_function("simhash_band_keys", c,
      org.apache.spark.sql.functions.lit(bandBits))

  /** Multi-probe band keys (each band key XOR every Hamming<=1 mask). */
  def simhash_probe_keys(c: Column, bandBits: Int): Column =
    call_function("simhash_probe_keys", c,
      org.apache.spark.sql.functions.lit(bandBits))

  /** One hashed long per MinHash band (primitive LSH join key). */
  def minhash_band_keys(c: Column, bands: Int): Column =
    call_function("minhash_band_keys", c,
      org.apache.spark.sql.functions.lit(bands))

  /** Total Hamming distance between two array<long> signatures. */
  def hamming_total(a: Column, b: Column): Column =
    call_function("hamming_total", a, b)

  /** Count of equal positions between two array<long> signatures. */
  def match_count(a: Column, b: Column): Column =
    call_function("match_count", a, b)

  /** Random-hyperplane signature (nBits packed in a long) of array<float>. */
  def rp_sign(c: Column, nBits: Int, seed: Long): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("rp_sign", c, lit(nBits), lit(seed))
  }

  /** Null-skipping one-allocation map<string,string> from k1,v1,k2,v2,... */
  def compact_map(kvs: Column*): Column = call_function("compact_map", kvs: _*)

  /** Merge map `upper` into `lower`, upper winning on key collision — the
    * reference's serde_json insert-overwrite, made safe against Spark's
    * default DUPLICATED_MAP_KEY map_concat exception. Native codegen'd
    * expression (the earlier map_filter composition was CodegenFallback
    * and ran interpreted on the hot syslog path).
    */
  def merge_maps(lower: Column, upper: Column): Column =
    call_function("merge_maps", lower, upper)

  /** The logfmt-transform merge (pop `field`, merge `parsed` in, rename
    * collisions "<field>.<key>" unless overwrite; null `parsed` returns
    * `fields` unchanged) as one codegen'd expression — the map_filter /
    * transform_keys composition it replaces was CodegenFallback.
    */
  def merge_maps_field(fields: Column, parsed: Column, field: String,
      overwrite: Boolean): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("merge_maps_field", fields, parsed, lit(field), lit(overwrite))
  }

  /** from_json(c, map<string,string>) as a codegen'd expression (null for
    * anything but a JSON object) — keeps projections containing the JSON
    * branch inside WholeStageCodegen (JsonToStructs is CodegenFallback and
    * would exclude the whole operator).
    */
  def json_flat_map(c: Column): Column = call_function("json_flat_map", c)

  /** Reference-parity NDJSON event line (serde_json over a BTreeMap event:
    * compact, sorted keys; `numericKeys` emitted as bare i64 when canonical
    * — fortinet.rs:105 / syslog.rs:55-64). See [[EventJson]].
    */
  def event_json(m: Column, numericKeys: Seq[String] = Seq("t")): Column =
    call_function("event_json", m,
      org.apache.spark.sql.functions.lit(numericKeys.mkString(",")))

  /** Nearest-centroid index (max cosine, ties low) against a driver-side
    * centroid table (empty/null slots = dead cells, skipped).
    */
  def nearest_cell(vec: Column, cents: Seq[Seq[Float]]): Column =
    call_function("nearest_cell", vec,
      org.apache.spark.sql.functions.typedlit(cents))

  /** One-shot regex match returning all capture groups (null = no match). */
  def regexp_groups(c: Column, pattern: String): Column =
    call_function("regexp_groups", c, org.apache.spark.sql.functions.lit(pattern))

  /** Rademacher random projection of array<float> to outDims dims. */
  def rp_project(c: Column, outDims: Int, seed: Long): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("rp_project", c, lit(outDims), lit(seed))
  }
}
