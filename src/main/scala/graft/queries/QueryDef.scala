package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** One named query: a Spark DataFrame builder plus (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB as the correctness
  * oracle. Column names MUST match between the two (the driver sorts
  * columns by name before hashing values).
  */
final case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String]) {
  def tuple: (String, (SparkSession, String) => DataFrame) = name -> build
}

/** Cross-engine determinism helpers.
  *
  * DuckDB and Spark must produce bit-identical values for the driver's
  * hash compare. Floating-point SUM/AVG are order-dependent, so every
  * money/measure aggregate here goes through exact decimal arithmetic
  * and is cast to double only at the very end (decimal→double is
  * correctly rounded in both engines → identical bits). This also keeps
  * results stable across partition counts — important because the same
  * plan must give the same answer on 32 local threads and on a
  * 1000-executor cluster.
  */
object Det {
  /** Exact money/measure representation: decimal(p, s). */
  def dec(c: Column, p: Int = 14, s: Int = 2): Column = c.cast(DecimalType(p, s))

  /** Order-independent SUM of a double measure → double. */
  def sumd(c: Column, p: Int = 14, s: Int = 2): Column =
    sum(dec(c, p, s)).cast(DoubleType)

  /** Order-independent AVG: exact decimal sum, then one double divide. */
  def avgd(c: Column, p: Int = 14, s: Int = 2): Column =
    sum(dec(c, p, s)).cast(DoubleType) / count(lit(1))

  /** Timestamps are compared as epoch microseconds (int64) — avoids
    * timestamp-vs-timestamptz parquet logical-type mismatches between
    * the engines. Spark side.
    */
  def tsUs(c: Column): Column = unix_micros(c)
}
