package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Batch source/sink surface: parquet / CSV / JSON-lines readers with
  * explicit schemas (schema inference is a full extra pass at 100 TB —
  * never rely on it in production paths) and partitioned writers.
  */
object Io {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema)                       // no inference pass
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "PERMISSIVE")         // bad rows -> nulls, not job death
      .csv(path)

  def readJsonLines(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)

  /** Writer with the scale-relevant knobs: partition columns for
    * pruning (e.g. date), sorted-within-partitions layout for
    * row-group skipping, target file sizing via repartition.
    */
  def writer(df: DataFrame, partitionCols: Seq[String] = Nil,
      numFiles: Int = 0): DataFrameWriter[Row] = {
    val sized = if (numFiles > 0) df.repartition(numFiles) else df
    val w = sized.write.mode("overwrite")
    if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w
  }

  def writeParquet(df: DataFrame, path: String,
      partitionCols: Seq[String] = Nil, numFiles: Int = 0): Unit =
    writer(df, partitionCols, numFiles).parquet(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String,
      partitionCols: Seq[String] = Nil): Unit =
    writer(df, partitionCols).orc(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    writer(df).option("header", "true").csv(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    writer(df).json(path)
}
