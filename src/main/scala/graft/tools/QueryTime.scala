package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic: time one SparkEntry query under the Bench session
  * shape. SPARK_GRAFT_DEFAULT_SPLITS=1 drops the small-split configs so
  * their cost can be isolated. Usage: runMain graft.tools.QueryTime <name>
  * [sfDir] [reps]
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (!sys.env.contains("SPARK_GRAFT_DEFAULT_SPLITS")) {
      b.config("spark.sql.files.maxPartitionBytes", "16m")
      b.config("spark.sql.files.openCostInBytes", "0")
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      System.err.println(
        f"[qt] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
  }
}
