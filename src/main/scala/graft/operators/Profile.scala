package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DateType, MapType,
  NumericType, StringType, TimestampType}
import graft.sources.Tables

/** Table profiler — the data-quality first look every ingest runs:
  * per column, null count, exact distinct count, and min/max. Output
  * is one row per column with a type-routed value pair: numerics
  * (plus timestamps as epoch micros and dates as epoch days) land in
  * `min_num`/`max_num` as doubles, strings in `min_str`/`max_str`;
  * binary/array/struct/map columns keep their null count (and ndv
  * where the type is group-able — maps aren't) with both value lanes
  * null rather than failing the whole profile — numbers never surface
  * through engine-specific string formatting (Spark and DuckDB
  * disagree on double rendering), and min/max are single stored
  * values so no FP rounding is needed.
  *
  * Shape: ONE aggregate pass over the table. The exact
  * `countDistinct` set makes Catalyst plan a column-count-wide Expand
  * before the partial agg — exact ndv over k columns fundamentally
  * costs k passes' worth of rows, but they pipeline through one scan
  * and one shuffle. At 100 TB swap `exact = false`:
  * `approx_count_distinct` (HLL++) collapses the Expand to a plain
  * single-projection partial agg (ndv then carries the documented
  * ~2% relative error; everything else stays exact).
  */
object Profile {

  def profileOrders(spark: SparkSession, dir: String): DataFrame =
    profile(Tables.orders(spark, dir))

  def profile(df: DataFrame, exact: Boolean = true): DataFrame = {
    val nullNum = lit(null).cast("double")
    val nullStr = lit(null).cast("string")
    val metrics: Seq[Column] = df.schema.fields.toSeq.map { f =>
      val c = col(f.name)
      // maps aren't orderable OR group-able in Spark — ndv must sit out
      val ndv = f.dataType match {
        case _: MapType => lit(null).cast("long")
        case _ if exact => countDistinct(c)
        case _ => approx_count_distinct(c)
      }
      val (minN, maxN, minS, maxS) = f.dataType match {
        case StringType => (nullNum, nullNum, min(c), max(c))
        case TimestampType =>
          (min(unix_micros(c)).cast("double"),
           max(unix_micros(c)).cast("double"), nullStr, nullStr)
        case DateType => // epoch days (date -> double directly is invalid)
          (min(unix_date(c)).cast("double"),
           max(unix_date(c)).cast("double"), nullStr, nullStr)
        case _: NumericType | BooleanType =>
          (min(c).cast("double"), max(c).cast("double"), nullStr, nullStr)
        case _ => // binary/array/struct/map: no meaningful ordering lane
          (nullNum, nullNum, nullStr, nullStr)
      }
      struct(
        lit(f.name).as("col_name"),
        (count(lit(1)) - count(c)).as("n_nulls"),
        ndv.as("n_distinct"),
        minN.as("min_num"), maxN.as("max_num"),
        minS.as("min_str"), maxS.as("max_str"))
    }
    df.agg(array(metrics: _*).as("m"))
      .select(explode(col("m")).as("p"))
      .select(col("p.col_name"), col("p.n_nulls"), col("p.n_distinct"),
        col("p.min_num"), col("p.max_num"),
        col("p.min_str"), col("p.max_str"))
  }
}
