package graft

import org.apache.spark.sql.functions._

import graft.enrich.Enrich
import graft.functions.GraftFunctions

/** Pins the enrich-stage operator semantics against the reference:
  * insert_field/insert_ts overwrite matrix (insert_field.rs:84-86,
  * insert_ts.rs:89-91) and the logfmt transform's pop + collision-rename
  * merge (logfmt.rs:75-95).
  */
class EnrichSpec extends SparkSpec {

  private def mapOf(df: org.apache.spark.sql.DataFrame, c: String): Map[String, String] = {
    val row = df.select(col(c)).head()
    row.getMap[String, String](0).toMap
  }

  test("logfmt merge: collision renames to field.key when overwrite=false") {
    GraftFunctions.ensureRegistered(spark)
    val df = spark.range(1).select(
      map(lit("message"), lit("""a=1 b="x y""""), lit("a"), lit("keep")).as("f"))
    val out = df.select(
      Enrich.logfmtMergeField(col("f"), "message", overwrite = false).as("m"))
    assert(mapOf(out, "m") ===
      Map("a" -> "keep", "message.a" -> "1", "b" -> "x y"))
  }

  test("logfmt merge: overwrite=true replaces colliding keys") {
    GraftFunctions.ensureRegistered(spark)
    val df = spark.range(1).select(
      map(lit("message"), lit("a=1 b=2"), lit("a"), lit("old")).as("f"))
    val out = df.select(
      Enrich.logfmtMergeField(col("f"), "message", overwrite = true).as("m"))
    assert(mapOf(out, "m") === Map("a" -> "1", "b" -> "2"))
  }

  test("logfmt merge: absent field leaves the event unchanged") {
    GraftFunctions.ensureRegistered(spark)
    val df = spark.range(1).select(map(lit("x"), lit("1")).as("f"))
    val out = df.select(
      Enrich.logfmtMergeField(col("f"), "message", overwrite = false).as("m"))
    assert(mapOf(out, "m") === Map("x" -> "1"))
  }

  test("insertMapField matrix matches insert_field.rs:84-86") {
    GraftFunctions.ensureRegistered(spark)
    val base = map(lit("k"), lit("v"))
    val df = spark.range(1).select(
      Enrich.insertMapField(base, "k", lit("new"), overwrite = false).as("keep"),
      Enrich.insertMapField(base, "k", lit("new"), overwrite = true).as("over"),
      Enrich.insertMapField(base, "k2", lit("new"), overwrite = false).as("fresh"))
    assert(mapOf(df, "keep") === Map("k" -> "v"))
    assert(mapOf(df, "over") === Map("k" -> "new"))
    assert(mapOf(df, "fresh") === Map("k" -> "v", "k2" -> "new"))
  }
}
