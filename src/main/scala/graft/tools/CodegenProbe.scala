package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic: dump the generated code of the parse projection and
  * count how many times each format regex is actually EXECUTED per row
  * (i.e. did codegen subexpression elimination dedupe the repeated
  * regexp_groups calls across the format/fields when-branches?).
  */
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    // range-derived text defeats constant folding so the parse runs inside
    // a real WholeStageCodegen projection, as in the pipeline
    val df = graft.parse.PatternDictionary.parse(
      spark.range(100).select(concat(lit("<13>Jun  5 04:03:02 h"), col("id"),
        lit(" cron[7]: hello")).as("text")), 1717200000000L)
    import org.apache.spark.sql.execution.debug._
    println("== physical plan ==")
    println(df.queryExecution.executedPlan.toString.take(4000))
    val code = df.queryExecution.debug.codegenToSeq().map(_._2).mkString("\n")
    // RegexpGroups codegen calls a static matchGroups-style helper; count
    // call sites that reference each pattern constant
    def count(needle: String): Int =
      needle.r.findAllIn(code).length
    println("== codegen stats ==")
    println(s"total generated chars: ${code.length}")
    println(s"regexpGroups helper calls: ${count("matchGroups|RegexpGroups")}")
    println(s"subexpr functions: ${count("subExpr")}")
    println(s"logfmt calls: ${count("LogfmtParse")}")
    println(s"mergeMaps calls: ${count("MergeMaps")}")
    println(s"compactMap builds: ${count("CompactMap")}")
    println(s"from_json (fallback) evals: ${count("JsonToStructs")}")
    args.headOption.foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), code)
    }
    spark.stop()
  }
}
