package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.floor

/** Determinism helpers (SURVEY.md §5.3).
  *
  * Engine-native round() is NOT oracle-safe: Spark rounds the shortest
  * decimal string of the double (BigDecimal.valueOf), DuckDB rounds the
  * binary value — they disagree whenever a computed double sits on a .xx5
  * decimal boundary (measured: round(19570.815, 2) → 19570.82 in Spark,
  * 19570.81 in DuckDB). This `round` instead defines rounding as pure IEEE
  * double arithmetic — floor(x·10ⁿ + 0.5)/10ⁿ — which is bit-identical in
  * any IEEE-754 engine. Oracle SQL uses the literal same formula.
  *
  * Importing this AFTER `functions._` shadows the built-in round, so query
  * code keeps reading naturally.
  */
object Det {
  def round(c: Column, n: Int): Column = {
    val p = math.pow(10, n)
    floor(c * p + 0.5) / p
  }
}
