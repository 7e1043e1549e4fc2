package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the ANALYZE/data-quality pass a pipeline runs
  * before trusting a new drop: per-column row/null/distinct counts.
  * All counts are exact integers, so the whole profile hash-checks
  * cross-engine (min/max are deliberately excluded: their cross-engine
  * STRING rendering of doubles/dates is not deterministic, and a
  * uniform output schema would need strings).
  */
object Profile {

  /** One-pass column profile: a single aggregation computes every
    * column's (n_rows, n_nulls, n_distinct), then one `stack` melts the
    * row to (column_name, …) rows. Spark plans multi-column DISTINCT
    * aggregates with one Expand (rows × distinct-column count) feeding
    * map-side partial aggregation — one table scan total, where a
    * per-column loop would rescan the table |columns| times. DISTINCT
    * ignores nulls (SQL semantics) on both engines.
    */
  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    val aggs = columns.flatMap { c =>
      Seq(
        count(lit(1)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"))
    }
    // the names are interpolated into an expr() string — a quote or
    // backtick in a column name must read as DATA, not break parsing
    // or inject into the SQL (SQL string literals escape ' by
    // doubling; backtick-quoted identifiers escape ` by doubling)
    def sqlStr(c: String) = "'" + c.replace("'", "''") + "'"
    def sqlId(c: String) = "`" + c.replace("`", "``") + "`"
    val stackArgs = columns
      .map(c => s"${sqlStr(c)}, ${sqlId(s"${c}__n")}, " +
        s"${sqlId(s"${c}__nulls")}, ${sqlId(s"${c}__distinct")}")
      .mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${columns.size}, $stackArgs) AS " +
        "(column_name, n_rows, n_nulls, n_distinct)"))
  }
}
