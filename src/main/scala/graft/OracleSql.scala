package graft

/** DuckDB oracle SQL, one per SQL-expressible query in [[SparkEntry.queries]].
  *
  * Mirrors the Spark plans' determinism rules exactly: identical DECIMAL
  * accumulation for money sums, identical `ROUND(x, 6)` on order-sensitive
  * floating aggregates, identical total ORDER BY, identical output column
  * names and types (BIGINT↔long, DOUBLE↔double, INTEGER↔int, DATE↔date).
  */
object OracleSql extends OracleSqlPart4 {

  /** The full oracle map — assembled from the four part maps plus the
    * SQL-text surface (whose Spark side IS the same string where portable).
    */
  val sql: Map[String, String] =
    sqlPart1 ++ sqlPart2 ++ sqlPart3 ++ sqlPart4 ++ sqlSurface
}
