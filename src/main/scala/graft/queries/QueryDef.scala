package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-visible query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query.
  *
  * Determinism rules every QueryDef follows so the driver's hash compare is
  * stable across engines:
  *  - monetary/quantity aggregates go through exact DECIMAL arithmetic
  *    (`cast(x as decimal)` before `sum`) — double summation is
  *    order-dependent and would flicker between partitionings;
  *  - column names are aliased identically on both sides;
  *  - every result carries a total ORDER BY (Catalyst's EliminateSorts
  *    removes it under Bench's `.count()`, so it costs nothing there);
  *  - integer outputs are cast to BIGINT on both sides (DuckDB's
  *    `sum(int)` is HUGEINT, Spark's is LONG).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
