package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Cross-engine-portable primitives for the LLM-data-pipeline operators.
  *
  * Every hash / fold here is defined so that Spark (Catalyst built-ins,
  * whole-stage codegen) and the DuckDB oracle compute **bit-identical**
  * values:
  *
  *   - `h60`: a 60-bit integer hash = first 15 hex chars of md5 — both
  *     engines have md5 over UTF-8 bytes; 60 bits always fits a signed
  *     int64, so no unsigned edge cases.
  *   - double folds always start from an explicit 0.0 accumulator on the
  *     Spark side; DuckDB's `list_reduce` starts from the first element.
  *     Since `0.0 + x == x` exactly in IEEE-754, the two fold orders
  *     produce identical bits.
  *   - all modular arithmetic keeps intermediates < 2^63 (documented at
  *     each use site), so wrap-around can never differ between engines.
  *
  * Scale note: everything here is a pure Catalyst expression tree
  * (higher-order functions over arrays) — no UDFs, no serialization
  * boundary, fully whole-stage-codegen'd, and embarrassingly parallel
  * per row. At 100 TB the per-document work is O(tokens × constants)
  * with zero shuffle; only the candidate-pair joins (LSH band join,
  * shingle join) shuffle, and those shuffle compact keys, not documents.
  */
object Portable {

  /** 60-bit md5-based hash of a string column (fits int64, positive). */
  def h60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast(LongType)

  /** DuckDB rendering of [[h60]]. */
  def h60Sql(x: String): String = s"('0x' || substr(md5($x), 1, 15))::BIGINT"

  /** Whitespace tokens, empty-safe. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** DuckDB rendering of [[tokens]]. */
  def tokensSql(x: String): String =
    s"list_filter(string_split_regex($x, '\\s+'), t -> len(t) > 0)"

  /** Word 3-shingles (distinct), the unit for n-gram Jaccard / MinHash. */
  def shingles3(toks: Column): Column =
    when(size(toks) >= 3,
      array_distinct(transform(sequence(lit(1), size(toks) - 2), i =>
        concat_ws(" ", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))))
      .otherwise(array().cast("array<string>"))

  /** DuckDB rendering of [[shingles3]] given a token-list expression. */
  def shingles3Sql(toks: String): String =
    s"list_distinct(list_transform(generate_series(1, len($toks) - 2), i -> array_to_string(($toks)[i:i+2], ' ')))"

  /** Exact left-fold dot product of two float-array columns, in double.
    * Same accumulation order as the oracle ⇒ bit-identical result.
    *
    * Runs as the native [[graft.functions.VecDot]] expression (HOF
    * `aggregate`/`zip_with` are CodegenFallback — interpreted lambda +
    * boxing per element; the native form is a primitive loop inside
    * whole-stage codegen). Registered lazily into the active session.
    */
  def dot(a: Column, b: Column): Column = {
    // Best-effort convenience for ad-hoc/test columns; query paths are
    // guaranteed registration via Tables.t with their own session.
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.functions.GraftExtensions.register)
    call_function("vec_dot", a, b)
  }

  /** DuckDB rendering of [[dot]] (64-dim embeddings). */
  def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, len($a)), i -> ($a)[i]::DOUBLE * ($b)[i]::DOUBLE), (x, y) -> x + y)"

  /** Squared euclidean distance — native twin of [[dot]] (same fold
    * contract, `(aᵢ−bᵢ)²` terms). The IVF/k-means assignment kernel.
    */
  def dist2(a: Column, b: Column): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.functions.GraftExtensions.register)
    call_function("vec_dist2", a, b)
  }

  /** Exact INTEGER dot product over `array<bigint>` — the int8-quant
    * scoring kernel, as the native [[graft.functions.VecIDot]]
    * expression (same codegen rationale as [[dot]]; int64 arithmetic
    * is exact, so this is identical to the HOF fold it replaces).
    */
  def idot(a: Column, b: Column): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.functions.GraftExtensions.register)
    call_function("vec_idot", a, b)
  }

  /** DuckDB rendering of [[dist2]]. */
  def dist2Sql(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, len($a)), i -> " +
      s"(($a)[i]::DOUBLE - ($b)[i]::DOUBLE) * (($a)[i]::DOUBLE - ($b)[i]::DOUBLE)), (x, y) -> x + y)"

  /** L2 norm of a float-array column (same fold as [[dot]]). */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def l2normSql(a: String): String = s"sqrt(${dotSql(a, a)})"
}
