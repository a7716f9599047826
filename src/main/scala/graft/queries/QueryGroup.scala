package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** A named set of oracle-checked queries. `queries` builds the Spark plan;
  * `oracle` carries the equivalent DuckDB SQL (same column names, same
  * ORDER BY) the driver hash-compares against. Queries without an oracle
  * entry get a weaker rows-only check (approximate ops).
  */
trait QueryGroup {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}

/** Cross-engine float determinism helpers.
  *
  * Summing doubles is order-dependent, and Spark and DuckDB aggregate in
  * different orders — so every money-ish sum goes through DECIMAL(18,2)
  * (exact, order-independent) and is cast back to double at the end.
  * Averages are expressed as exact-sum / count in double (one deterministic
  * IEEE division) instead of engine-native avg().
  */
object Det {
  /** Exact 2-decimal view of a double column. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Order-independent sum of a 2-decimal double column, as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Order-independent sum of dec-products (price * (1 - discount)). */
  def dsumRevenue(price: Column, discount: Column): Column =
    sum(dec(price) * (lit(1).cast(DecimalType(18, 2)) - dec(discount))).cast("double")

  /** Deterministic average = exact sum / count. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** SQL fragments mirroring the helpers above (DuckDB side). */
  def sqlSum(col: String): String =
    s"CAST(sum(CAST($col AS DECIMAL(18,2))) AS DOUBLE)"
  def sqlRevenue(price: String = "l_extendedprice", disc: String = "l_discount"): String =
    s"CAST(sum(CAST($price AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST($disc AS DECIMAL(18,2)))) AS DOUBLE)"
  def sqlAvg(col: String): String = s"${sqlSum(col)} / count($col)"
}
