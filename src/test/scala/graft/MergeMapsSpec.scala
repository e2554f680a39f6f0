package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Pins for the native MergeMaps expression — it replaced the interpreted
  * map_filter composition on the hot syslog path, so these assert identical
  * semantics: right wins on collision, surviving-left-then-right key order
  * (oracle hashes depend on it), null-in -> null-out, and map-value nulls
  * surviving the merge.
  */
class MergeMapsSpec extends SparkSpec {

  private def mergeOf(sql: String): Any = {
    GraftFunctions.ensureRegistered(spark)
    spark.sql(s"SELECT $sql").head().get(0)
  }

  test("right wins on key collision; left order then right order") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    val df = Seq(1).toDF("x").select(
      GraftFunctions.merge_maps(
        map(lit("a"), lit("1"), lit("b"), lit("2"), lit("c"), lit("3")),
        map(lit("b"), lit("B"), lit("d"), lit("D"))).as("m"))
    val m = df.head().getMap[String, String](0)
    assert(m.toSeq === Seq("a" -> "1", "c" -> "3", "b" -> "B", "d" -> "D"))
  }

  test("null input propagates to null result") {
    assert(mergeOf("merge_maps(cast(null as map<string,string>), map('a','1'))") === null)
    assert(mergeOf("merge_maps(map('a','1'), cast(null as map<string,string>))") === null)
  }

  test("empty sides") {
    assert(mergeOf("merge_maps(map(), map('a','1'))")
      .asInstanceOf[Map[String, String]] === Map("a" -> "1"))
    assert(mergeOf("merge_maps(map('a','1'), map())")
      .asInstanceOf[Map[String, String]] === Map("a" -> "1"))
    assert(mergeOf("merge_maps(map(), map())")
      .asInstanceOf[Map[String, String]] === Map.empty)
  }

  test("null VALUES survive the merge (from_json maps carry them)") {
    val m = mergeOf(
      "merge_maps(map('a', cast(null as string)), map('b', cast(null as string)))")
      .asInstanceOf[Map[String, String]]
    assert(m === Map("a" -> null, "b" -> null))
  }

  test("matches the reference composition on random maps") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    // build many (lower, upper) pairs with overlapping key spaces and
    // compare native merge against the map_filter/map_concat composition
    val df = spark.range(200).select(
      map_from_arrays(
        transform(sequence(lit(0), pctCol(5)), i => concat(lit("k"), i % 7)),
        transform(sequence(lit(0), pctCol(5)), i => concat(lit("L"), i))).as("lower"),
      map_from_arrays(
        transform(sequence(lit(0), pctCol(3)), i => concat(lit("k"), (i + 2) % 7)),
        transform(sequence(lit(0), pctCol(3)), i => concat(lit("U"), i))).as("upper"))
    // key construction stays injective per map (sizes <= 5 against mod-7
    // key space) so ANSI's DUPLICATED_MAP_KEY never fires on the inputs
    val composed = map_concat(
      map_filter(col("lower"), (k, _) => !map_contains_key(col("upper"), k)),
      col("upper"))
    val rows = df.select(
      GraftFunctions.merge_maps(col("lower"), col("upper")).as("native"),
      composed.as("composed")).collect()
    rows.foreach { r =>
      assert(r.getMap[String, String](0).toSeq === r.getMap[String, String](1).toSeq)
    }
  }

  // deterministic small "random" sizes from the row id (no Date/rand)
  private def pctCol(mod: Int) = (col("id") % mod).cast("int")
}
