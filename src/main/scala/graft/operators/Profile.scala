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
  * Shape: ONE aggregate pass over the table. The DEFAULT ndv lane is
  * `approx_count_distinct` (HLL++): a plain single-projection partial
  * agg whose cost is one scan regardless of column count, with the
  * documented ~2% relative ndv error (everything else stays exact).
  * `exact = true` switches to `countDistinct`, which makes Catalyst
  * plan a column-count-wide Expand before the partial agg — exact ndv
  * over k columns fundamentally costs k passes' worth of rows.
  * Measured (SURVEY §4.5): the Expand lane read 11.4× SUPERLINEAR at
  * the fourth scale decade (208.5 s at 100×) until the r11 scan-split
  * fix (Par.ensure before the Expand: 39.4 s — the superlinearity was
  * mostly split-starved serialization of the ×k rows) while HLL++
  * stays linear (~15 s, deliberately WITHOUT the repartition — see
  * the in-body note) — the 100 TB-safe approx lane is the default and
  * exact is the opt-in for small-table oracle-grade profiling.
  */
object Profile {

  /** Driver contract `profile_table`: the EXACT lane, because the
    * DuckDB oracle hash-matches stored values and HLL++ estimates
    * differ across engines. The benched 100 TB shape is
    * [[profileOrdersApprox]] (`profile_table_approx`).
    */
  def profileOrders(spark: SparkSession, dir: String): DataFrame =
    profile(Tables.orders(spark, dir), exact = true)

  /** Driver contract `profile_table_approx`: the default (HLL++) lane;
    * rows/schema-checked only — estimates are engine-specific.
    */
  def profileOrdersApprox(spark: SparkSession, dir: String): DataFrame =
    profile(Tables.orders(spark, dir))

  def profile(df: DataFrame, exact: Boolean = false): DataFrame = {
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
    // Par.ensure on the EXACT lane only: its Expand multiplies rows
    // ×k BEFORE the partial agg, so split-starved scans serialize k
    // passes' worth of work (measured 100×: 187 → 39 s with the
    // repartition). The HLL lane's per-row cost is one cheap sketch
    // update — there the scan-copy shuffle COSTS more than the
    // starved partials (measured ~15 → 20 s), so it stays a pure
    // one-scan plan (plan-spec'd).
    val src = if (exact) Par.ensure(df) else df
    src.agg(array(metrics: _*).as("m"))
      .select(explode(col("m")).as("p"))
      .select(col("p.col_name"), col("p.n_nulls"), col("p.n_distinct"),
        col("p.min_num"), col("p.max_num"),
        col("p.min_str"), col("p.max_str"))
  }
}
