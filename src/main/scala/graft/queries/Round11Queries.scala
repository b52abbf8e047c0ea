package graft.queries

import graft.{QDef, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 surface: the last daily-driver scalar families nothing in
  * q01–q201 exercised — delimiter-indexed string surgery (`substring_index` /
  * `overlay` / `elt` / `format_number` / `soundex`), the SQL-standard
  * number/date FORMATTING pair (`to_char` / `to_number`, SPARK-41520 family)
  * with `months_between`, and the error-safe `try_*` arithmetic contract
  * (overflow/div-zero/parse-failure → NULL, never an exception — the
  * semantics a 100 TB batch job needs to survive one poisoned row) plus
  * `equal_null` and `luhn_check`.
  *
  * All queries follow the SURVEY.md §2b determinism conventions (trailing
  * total-order sort, integer or ROUND(x,2) outputs, DuckDB HUGEINT casts).
  */
object Round11Queries {

  // --------------------------------------------------------------------------
  // q202: delimiter/positional string surgery — `substring_index` (first-N /
  // last-N delimited parts, the path/hostname-chopping shape), `overlay`
  // (fixed-position masking, the PII-redaction shape), `elt` (1-based string
  // table lookup), `format_number` (locale-grouped display form), `soundex`
  // (phonetic bucketing). The oracle rebuilds each from primitives: list
  // slicing for substring_index, substr concatenation for overlay, CASE for
  // elt, fmt-lib grouping for format_number — and soundex against codes
  // hand-derived from the PUBLISHED American Soundex algorithm (F653 etc.),
  // so the hash pins Spark to the standard, not to itself. All codegen'd
  // scalars — the whole row pipeline stays in one WholeStageCodegen span.
  // --------------------------------------------------------------------------
  private def q202(s: SparkSession, d: String): DataFrame = {
    val c = T.customer(s, d).select(
      col("c_custkey").as("cust"),
      col("c_mktsegment").as("seg"),
      concat_ws("-", col("c_mktsegment"), col("c_name"),
        col("c_custkey").cast("string")).as("tag"),
      col("c_name").as("nm"),
      floor(col("c_acctbal") * 100).cast("long").as("cents"))
    c.select(col("cust"),
        substring_index(col("tag"), "-", 2).as("first2"),
        substring_index(col("tag"), "-", -2).as("last2"),
        overlay(col("nm"), lit("XXXX"), lit(10), lit(4)).as("masked"),
        elt(col("cust") % 3 + 1, lit("alpha"), lit("beta"), lit("gamma")).as("bucket"),
        format_number(col("cents"), 0).as("grouped"),
        soundex(col("seg")).as("seg_code"))
      .orderBy(col("cust"))
  }

  private val q202Sql =
    """WITH src AS (
         SELECT c_custkey AS cust, c_mktsegment AS seg,
                c_mktsegment || '-' || c_name || '-' || CAST(c_custkey AS VARCHAR) AS tag,
                c_name AS nm,
                CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS cents
         FROM customer)
       SELECT cust,
              array_to_string(list_slice(string_split(tag, '-'), 1, 2), '-') AS first2,
              array_to_string(list_slice(string_split(tag, '-'), -2, -1), '-') AS last2,
              substr(nm, 1, 9) || 'XXXX' || substr(nm, 14) AS masked,
              CASE cust % 3 + 1 WHEN 1 THEN 'alpha' WHEN 2 THEN 'beta'
                                ELSE 'gamma' END AS bucket,
              format('{:,}', cents) AS grouped,
              CASE seg WHEN 'FURNITURE' THEN 'F653' WHEN 'MACHINERY' THEN 'M256'
                       WHEN 'AUTOMOBILE' THEN 'A351' WHEN 'BUILDING' THEN 'B435'
                       WHEN 'HOUSEHOLD' THEN 'H243' END AS seg_code
       FROM src ORDER BY cust"""

  // --------------------------------------------------------------------------
  // q203: SQL-standard FORMATTING pair — `to_char` (datetime → pattern
  // string), `to_number` (grouped digit string → exact numeric, here closing
  // a format_number round trip so losslessness is hash-proven per row), and
  // `months_between` pinned integral by month-truncating both endpoints
  // (fractional months are float-hazard; whole months are calendar facts the
  // oracle reproduces with date_diff). All parse/format work is per-row
  // codegen'd scalar — no shuffle beyond the final sort.
  // --------------------------------------------------------------------------
  private def q203(s: SparkSession, d: String): DataFrame = {
    T.orders(s, d)
      .select(col("o_orderkey").as("k"),
        col("o_orderdate"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
      .where(col("k") % 10 === 0)
      .select(col("k"),
        to_char(col("o_orderdate"), lit("yyyy-MM")).as("ym"),
        months_between(to_date(lit("1998-08-01")),
          date_trunc("MONTH", col("o_orderdate"))).cast("long").as("mdiff"),
        to_number(format_number(col("cents"), 0), lit("999,999,999,999"))
          .cast("long").as("cents_rt"))
      .orderBy(col("k"))
  }

  private val q203Sql =
    """SELECT o_orderkey AS k,
              strftime(o_orderdate, '%Y-%m') AS ym,
              CAST(date_diff('month', date_trunc('month', CAST(o_orderdate AS DATE)),
                             DATE'1998-08-01') AS BIGINT) AS mdiff,
              CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents_rt
       FROM orders WHERE o_orderkey % 10 = 0 ORDER BY k"""

  // --------------------------------------------------------------------------
  // q204: error-safe arithmetic contract — `try_divide` / `try_add` /
  // `try_multiply` / `try_to_number` return NULL on division-by-zero,
  // overflow, and parse failure instead of failing the job (ANSI mode's
  // survival hatch: at 100 TB one poisoned row must not kill a 6-hour batch);
  // `equal_null` (null-safe equality as a scalar) and `luhn_check` (checksum
  // validation) complete the row-validation family. Overflow is planted
  // exactly (Long.MaxValue + 1, 2^62 * 2); the oracle reproduces every NULL
  // site with CASE guards, and Luhn with the PUBLISHED doubling algorithm as
  // a DuckDB list comprehension — both engines compute the checksum
  // independently over thousands of derived digit strings.
  // --------------------------------------------------------------------------
  private def q204(s: SparkSession, d: String): DataFrame = {
    T.orders(s, d).createOrReplaceTempView("safe_src")
    s.sql(
      """WITH src AS (
        |  SELECT o_orderkey AS k,
        |         CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM safe_src)
        |SELECT
        |  SUM(CASE WHEN try_divide(cents * 100, k % 7) IS NULL THEN 1 ELSE 0 END) AS n_div0,
        |  CAST(SUM(CAST(ROUND(COALESCE(try_divide(cents * 100, k % 7), 0), 0) AS BIGINT)) AS BIGINT) AS div_sum,
        |  SUM(CASE WHEN try_add(9223372036854775807L, k % 2) IS NULL THEN 1 ELSE 0 END) AS n_add_over,
        |  SUM(CASE WHEN try_multiply(4611686018427387904L, 1 + k % 2) IS NULL THEN 1 ELSE 0 END) AS n_mul_over,
        |  SUM(CASE WHEN try_to_number(CASE WHEN k % 3 = 0 THEN 'x'
        |                                   ELSE CAST(k % 1000 AS STRING) END,
        |                              '999999') IS NULL THEN 1 ELSE 0 END) AS n_badnum,
        |  SUM(CASE WHEN equal_null(NULLIF(k % 5, 0), NULLIF(k % 7, 0)) THEN 1 ELSE 0 END) AS n_eqnull,
        |  SUM(CASE WHEN luhn_check(CAST(k AS STRING)) THEN 1 ELSE 0 END) AS n_luhn,
        |  (SELECT SUM(CASE WHEN luhn_check(c) THEN 1 ELSE 0 END)
        |   FROM VALUES ('79927398713'), ('79927398714'), ('4111111111111111'), ('123') AS t(c)) AS n_luhn_canon
        |FROM src""".stripMargin)
  }

  private val q204Sql =
    """WITH src AS (
         SELECT o_orderkey AS k,
                CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
         FROM orders),
       luhn AS (
         SELECT c, list_sum(list_transform(range(1, len(c) + 1),
                  i -> CASE WHEN (len(c) - i) % 2 = 0 THEN CAST(c[i] AS INT)
                            ELSE CASE WHEN 2 * CAST(c[i] AS INT) > 9
                                      THEN 2 * CAST(c[i] AS INT) - 9
                                      ELSE 2 * CAST(c[i] AS INT) END END)) % 10 = 0 AS ok
         FROM (VALUES ('79927398713'), ('79927398714'), ('4111111111111111'), ('123')) t(c))
       SELECT
         SUM(CASE WHEN k % 7 = 0 THEN 1 ELSE 0 END) AS n_div0,
         CAST(SUM(CASE WHEN k % 7 = 0 THEN 0
                       ELSE CAST(ROUND(cents * 100 / (k % 7), 0) AS BIGINT) END) AS BIGINT) AS div_sum,
         SUM(CASE WHEN k % 2 = 1 THEN 1 ELSE 0 END) AS n_add_over,
         SUM(CASE WHEN k % 2 = 1 THEN 1 ELSE 0 END) AS n_mul_over,
         SUM(CASE WHEN k % 3 = 0 THEN 1 ELSE 0 END) AS n_badnum,
         SUM(CASE WHEN NULLIF(k % 5, 0) IS NOT DISTINCT FROM NULLIF(k % 7, 0)
                  THEN 1 ELSE 0 END) AS n_eqnull,
         SUM(CASE WHEN (SELECT list_sum(list_transform(range(1, len(CAST(k AS VARCHAR)) + 1),
                  i -> CASE WHEN (len(CAST(k AS VARCHAR)) - i) % 2 = 0
                            THEN CAST((CAST(k AS VARCHAR))[i] AS INT)
                            ELSE CASE WHEN 2 * CAST((CAST(k AS VARCHAR))[i] AS INT) > 9
                                      THEN 2 * CAST((CAST(k AS VARCHAR))[i] AS INT) - 9
                                      ELSE 2 * CAST((CAST(k AS VARCHAR))[i] AS INT) END END)) % 10
                ) = 0 THEN 1 ELSE 0 END) AS n_luhn,
         (SELECT CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) FROM luhn) AS n_luhn_canon
       FROM src"""

  val defs: Seq[QDef] = Seq(
    QDef("q202_string_surgery", q202, Some(q202Sql)),
    QDef("q203_format_roundtrip", q203, Some(q203Sql)),
    QDef("q204_safe_arithmetic", q204, Some(q204Sql)))
}
