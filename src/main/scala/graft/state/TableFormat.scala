package graft.state

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** The narrow table-format seam promised in SURVEY.md §7.1.7: everything the
  * pipeline needs from a table store is "read the current snapshot", "append
  * rows", and "atomically replace the partitions present in a frame".
  *
  * No Iceberg runtime jar exists in this offline sandbox, so the bound
  * implementation is [[ParquetFormat]] (parquet + the pipeline's own
  * manifest, which the resume semantics need anyway). The production Iceberg
  * binding is one line per method and needs no manifest changes:
  *
  *   - readSnapshot  -> `spark.read.format("iceberg").load(table)`
  *   - append        -> `df.writeTo(table).append()`
  *   - overwritePartitions -> `df.writeTo(table).overwritePartitions()`
  *     (Iceberg's dynamic partition overwrite — same contract as the
  *     parquet `partitionOverwriteMode=dynamic` used here)
  */
trait TableFormat {

  /** Current snapshot; empty frame with `schemaDdl` if the table is absent. */
  def readSnapshot(spark: SparkSession, path: String, schemaDdl: String): DataFrame

  /** Snapshot of a table that must exist. */
  def readSnapshot(spark: SparkSession, path: String): DataFrame

  def exists(spark: SparkSession, path: String): Boolean

  def append(df: DataFrame, path: String): Unit

  /** Replace exactly the partitions present in `df` (dynamic overwrite);
    * with no partition columns, replaces the whole table.
    */
  def overwritePartitions(df: DataFrame, path: String, partitionCols: Seq[String]): Unit
}

/** NDJSON (json-lines) binding of the same seam — the interop format every
  * reference sink emits (file.rs:859-871, stdio.rs:120-124,
  * tcp_socket.rs:62-70: one JSON object per line). `Pipeline.run(spark,
  * cfg, NdjsonFormat)` therefore fans out NDJSON sinks with identical
  * manifest/resume semantics; per-EVENT byte parity with the reference's
  * file sink is the [[graft.functions.EventJson]] expression (this binding
  * writes the full typed envelope per line, a superset). Columnar pushdown
  * is lost (text format) — parquet/Iceberg stays the default for anything
  * scanned again at scale; NDJSON is for interop boundaries.
  */
object NdjsonFormat extends TableFormat {

  override def readSnapshot(spark: SparkSession, path: String, schemaDdl: String): DataFrame =
    if (exists(spark, path)) spark.read.schema(schemaDdl).json(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(schemaDdl))

  override def readSnapshot(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  override def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  override def append(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).json(path)

  override def overwritePartitions(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit = {
    val w = df.write
      .option("partitionOverwriteMode", "dynamic")
      .mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .json(path)
  }
}

/** Parquet binding: directory-per-table, dynamic partition overwrite. */
object ParquetFormat extends TableFormat {

  override def readSnapshot(spark: SparkSession, path: String, schemaDdl: String): DataFrame =
    if (exists(spark, path)) spark.read.schema(schemaDdl).parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(schemaDdl))

  override def readSnapshot(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  override def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  override def append(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path)

  override def overwritePartitions(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit = {
    val w = df.write
      .option("partitionOverwriteMode", "dynamic")
      .mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }
}
