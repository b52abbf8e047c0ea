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
  * `equal_null` and `luhn_check`; the XPath extraction family (round-trip
  * pinned); the URL form-codec pair; array construction (`arrays_zip` /
  * `posexplode` / `array_repeat` / `shuffle` invariants); scalar
  * odds-and-ends (`bround` HALF_EVEN, `factorial`, `expm1`/`log1p`,
  * multibyte length triple, `nvl2`/`ifnull`, `typeof`, `assert_true` /
  * `raise_error`); datetime completion (`unix_date`, `date_part`, IANA
  * timezone conversion, interval constructors); and runtime-introspection
  * INVARIANTS for the inherently nondeterministic functions.
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
        |FROM src ORDER BY 1""".stripMargin)
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
         CAST(SUM(CASE WHEN k % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_div0,
         CAST(SUM(CASE WHEN k % 7 = 0 THEN 0
                       ELSE CAST(ROUND(cents * 100 / (k % 7), 0) AS BIGINT) END) AS BIGINT) AS div_sum,
         CAST(SUM(CASE WHEN k % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_add_over,
         CAST(SUM(CASE WHEN k % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_mul_over,
         CAST(SUM(CASE WHEN k % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_badnum,
         CAST(SUM(CASE WHEN NULLIF(k % 5, 0) = NULLIF(k % 7, 0)
                       OR (k % 5 = 0 AND k % 7 = 0)
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_eqnull,
         CAST(SUM(CASE WHEN (SELECT list_sum(list_transform(range(1, len(CAST(k AS VARCHAR)) + 1),
                  i -> CASE WHEN (len(CAST(k AS VARCHAR)) - i) % 2 = 0
                            THEN CAST((CAST(k AS VARCHAR))[i] AS INT)
                            ELSE CASE WHEN 2 * CAST((CAST(k AS VARCHAR))[i] AS INT) > 9
                                      THEN 2 * CAST((CAST(k AS VARCHAR))[i] AS INT) - 9
                                      ELSE 2 * CAST((CAST(k AS VARCHAR))[i] AS INT) END END)) % 10
                ) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_luhn,
         (SELECT CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) FROM luhn) AS n_luhn_canon
       FROM src ORDER BY 1"""

  // --------------------------------------------------------------------------
  // q205: XPath extraction family — `xpath_string` / `xpath_long` /
  // `xpath_boolean` / `xpath` (node-set → array) over XML SYNTHESIZED from
  // the row's own columns, so the oracle is the identity: whatever xpath
  // pulls back out must equal what went in (the q203 round-trip pattern
  // applied to markup). Node-set cardinality varies per row (one vs two
  // <t> tags), pinning repeated-element semantics. Per-row scalar work,
  // no shuffle beyond the final sort.
  // --------------------------------------------------------------------------
  private def q205(s: SparkSession, d: String): DataFrame = {
    T.orders(s, d).createOrReplaceTempView("xml_src")
    s.sql(
      """WITH src AS (
        |  SELECT o_orderkey AS k,
        |         CONCAT('<o><st>', o_orderstatus, '</st><p>',
        |                CAST(CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS STRING),
        |                '</p><tags>',
        |                CASE WHEN o_orderkey % 2 = 0 THEN '<t>a</t><t>b</t>'
        |                     ELSE '<t>a</t>' END,
        |                '</tags></o>') AS xml
        |  FROM xml_src WHERE o_orderkey % 10 = 0)
        |SELECT k,
        |       xpath_string(xml, '/o/st') AS st,
        |       xpath_long(xml, '/o/p') AS cents,
        |       xpath_boolean(xml, '/o/p>1000000') AS big,
        |       SIZE(xpath(xml, '/o/tags/t/text()')) AS n_tags,
        |       ARRAY_JOIN(xpath(xml, '/o/tags/t/text()'), ',') AS tags
        |FROM src ORDER BY k""".stripMargin)
  }

  private val q205Sql =
    """SELECT o_orderkey AS k, o_orderstatus AS st,
              CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
              CAST(FLOOR(o_totalprice * 100) AS BIGINT) > 1000000 AS big,
              CASE WHEN o_orderkey % 2 = 0 THEN 2 ELSE 1 END AS n_tags,
              CASE WHEN o_orderkey % 2 = 0 THEN 'a,b' ELSE 'a' END AS tags
       FROM orders WHERE o_orderkey % 10 = 0 ORDER BY k"""

  // --------------------------------------------------------------------------
  // q206: URL form-codec pair — `url_encode` / `url_decode`
  // (application/x-www-form-urlencoded: space→'+', reserved→%XX). The
  // decode(encode(x)) round trip is hash-proven per row, and the encoded
  // form itself is pinned against an oracle that rebuilds the escaping from
  // the PUBLISHED encoding table (space→+, &→%26, #→%23, /→%2F) over a
  // controlled alphabet — Spark is tied to the spec, not to itself.
  // --------------------------------------------------------------------------
  private def q206(s: SparkSession, d: String): DataFrame = {
    val c = T.customer(s, d).select(
      col("c_custkey").as("cust"),
      when(col("c_custkey") % 2 === 0, concat(lit("user"), col("c_custkey")))
        .otherwise(concat(col("c_mktsegment"), lit(" & "), col("c_name"),
          lit("/"), col("c_custkey"))).as("raw"))
    c.select(col("cust"),
        url_decode(url_encode(col("raw"))).as("rt"),
        url_encode(col("raw")).as("enc"))
      .orderBy(col("cust"))
  }

  private val q206Sql =
    """WITH src AS (
         SELECT c_custkey AS cust,
                CASE WHEN c_custkey % 2 = 0 THEN 'user' || CAST(c_custkey AS VARCHAR)
                     ELSE c_mktsegment || ' & ' || c_name || '/' || CAST(c_custkey AS VARCHAR)
                END AS raw,
                CASE WHEN c_custkey % 2 = 0 THEN 'user' || CAST(c_custkey AS VARCHAR)
                     ELSE c_mktsegment || '+%26+' || replace(c_name, '#', '%23')
                          || '%2F' || CAST(c_custkey AS VARCHAR)
                END AS enc
         FROM customer)
       SELECT cust, raw AS rt, enc FROM src ORDER BY cust"""

  // --------------------------------------------------------------------------
  // q207: array CONSTRUCTION family — `arrays_zip` (zip-to-longest, short
  // side null-padded — pinned by zipping a 2-array with a 1-array),
  // `posexplode` of the zipped structs (LATERAL VIEW, position-stable),
  // `array_repeat`, and the `shuffle` permutation INVARIANT (sorting the
  // shuffled array restores it exactly — the only deterministic fact a
  // random permutation offers, proven inside the query). Oracle rebuilds
  // the explosion relationally with an indexed UNION ALL.
  // --------------------------------------------------------------------------
  private def q207(s: SparkSession, d: String): DataFrame = {
    T.orders(s, d).createOrReplaceTempView("zip_src")
    s.sql(
      """WITH src AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st,
        |         ARRAY(o_orderkey % 5, o_orderkey % 7) AS a,
        |         ARRAY(o_orderkey % 3) AS b
        |  FROM zip_src WHERE o_orderkey % 10 = 0)
        |SELECT k, pos, z.a AS av, z.b AS bv,
        |       ARRAY_JOIN(ARRAY_REPEAT(st, CAST(k % 3 AS INT)), '') AS rep,
        |       ARRAY_JOIN(ARRAY_SORT(SHUFFLE(a)), ',') AS sorted_perm,
        |       SIZE(SHUFFLE(a)) AS n_perm
        |FROM src LATERAL VIEW POSEXPLODE(ARRAYS_ZIP(a, b)) t AS pos, z
        |ORDER BY k, pos""".stripMargin)
  }

  private val q207Sql =
    """WITH src AS (
         SELECT o_orderkey AS k, o_orderstatus AS st,
                o_orderkey % 5 AS a1, o_orderkey % 7 AS a2, o_orderkey % 3 AS b1
         FROM orders WHERE o_orderkey % 10 = 0),
       zipped AS (
         SELECT k, st, 0 AS pos, a1 AS av, b1 AS bv, a1, a2 FROM src
         UNION ALL
         SELECT k, st, 1 AS pos, a2 AS av, NULL AS bv, a1, a2 FROM src)
       SELECT k, pos, av, bv,
              repeat(st, CAST(k % 3 AS INT)) AS rep,
              CAST(least(a1, a2) AS VARCHAR) || ',' || CAST(greatest(a1, a2) AS VARCHAR)
                AS sorted_perm,
              2 AS n_perm
       FROM zipped ORDER BY k, pos"""

  // --------------------------------------------------------------------------
  // q208: scalar odds-and-ends that complete the math/string/conditional
  // inventory — `bround` (banker's HALF_EVEN rounding, pinned on EXACT .5
  // halves where it visibly diverges from round's HALF_UP), `factorial`,
  // `expm1`/`log1p` (precision-safe forms), the three length measures on a
  // planted MULTIBYTE string (char vs bit vs octet — UTF-8 honesty),
  // `nvl2`/`ifnull`, a `typeof` census, `assert_true` (NULL on success) and
  // `raise_error` behind a never-true branch (lazy-evaluation pin: the
  // error must NOT fire), and deterministic `any_value` over a
  // single-value group. All per-row codegen'd scalars.
  // --------------------------------------------------------------------------
  private def q208(s: SparkSession, d: String): DataFrame = {
    T.orders(s, d).createOrReplaceTempView("misc_src")
    s.sql(
      """WITH src AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st,
        |         CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM misc_src WHERE o_orderkey % 10 = 0)
        |SELECT k,
        |       CAST(BROUND(k + 0.5D) AS BIGINT) AS banker,
        |       CAST(ROUND(k + 0.5D) AS BIGINT) AS half_up,
        |       FACTORIAL(CAST(k % 15 AS INT)) AS fact,
        |       ROUND(EXPM1(CAST(k % 3 AS DOUBLE)), 2) AS em1,
        |       ROUND(LOG1P(CAST(k % 3 AS DOUBLE)), 2) AS l1p,
        |       CHAR_LENGTH(CONCAT(st, 'é')) AS n_chars,
        |       BIT_LENGTH(CONCAT(st, 'é')) AS n_bits,
        |       OCTET_LENGTH(CONCAT(st, 'é')) AS n_octets,
        |       NVL2(NULLIF(k % 3, 0), 'set', 'unset') AS nv,
        |       IFNULL(NULLIF(k % 5, 0), -1) AS ifn,
        |       TYPEOF(k) AS t_k, TYPEOF(st) AS t_st,
        |       CASE WHEN cents < 0 THEN RAISE_ERROR('negative price') ELSE 'ok' END AS guard,
        |       COALESCE(CAST(ASSERT_TRUE(cents >= 0) AS STRING), 'passed') AS asserted,
        |       (SELECT ANY_VALUE(x) FROM VALUES (7), (7), (7) AS t(x)) AS av7
        |FROM src ORDER BY k""".stripMargin)
  }

  private val q208Sql =
    """SELECT o_orderkey AS k,
              CAST(round_even(o_orderkey + 0.5, 0) AS BIGINT) AS banker,
              CAST(ROUND(o_orderkey + 0.5, 0) AS BIGINT) AS half_up,
              CAST(factorial(CAST(o_orderkey % 15 AS INT)) AS BIGINT) AS fact,
              ROUND(EXP(CAST(o_orderkey % 3 AS DOUBLE)) - 1, 2) AS em1,
              ROUND(LN(1 + CAST(o_orderkey % 3 AS DOUBLE)), 2) AS l1p,
              length(o_orderstatus || 'é') AS n_chars,
              8 * strlen(o_orderstatus || 'é') AS n_bits,
              strlen(o_orderstatus || 'é') AS n_octets,
              CASE WHEN NULLIF(o_orderkey % 3, 0) IS NOT NULL THEN 'set' ELSE 'unset' END AS nv,
              COALESCE(NULLIF(o_orderkey % 5, 0), -1) AS ifn,
              'bigint' AS t_k, 'string' AS t_st,
              'ok' AS guard, 'passed' AS asserted, 7 AS av7
       FROM orders WHERE o_orderkey % 10 = 0 ORDER BY k"""

  // --------------------------------------------------------------------------
  // q209: datetime completion 2 — epoch-day round trip (`unix_date` /
  // `date_from_unix_date`), `date_part` (SQL-standard field extraction),
  // timezone CONVERSION (`from_utc_timestamp`, `convert_timezone` — IANA
  // zone math both engines resolve independently, DST-sensitive), and
  // interval CONSTRUCTORS `make_dt_interval` / `make_ym_interval` (the
  // year-month form pinned on end-of-month CLAMPING: Jan 31 + 13 months =
  // Feb 28). Timestamps emitted as formatted strings per §2b conventions.
  // --------------------------------------------------------------------------
  private def q209(s: SparkSession, d: String): DataFrame = {
    T.orders(s, d).createOrReplaceTempView("dt2_src")
    s.sql(
      """SELECT o_orderkey AS k,
        |       UNIX_DATE(CAST(o_orderdate AS DATE)) AS epoch_day,
        |       CAST(DATE_FROM_UNIX_DATE(UNIX_DATE(CAST(o_orderdate AS DATE)) + 30) AS STRING) AS d30,
        |       DATE_PART('YEAR', o_orderdate) AS yr,
        |       DATE_PART('QUARTER', o_orderdate) AS qtr,
        |       DATE_FORMAT(FROM_UTC_TIMESTAMP(o_orderdate, 'America/Los_Angeles'),
        |                   'yyyy-MM-dd HH:mm') AS la,
        |       DATE_FORMAT(CONVERT_TIMEZONE('UTC', 'Asia/Tokyo', o_orderdate),
        |                   'yyyy-MM-dd HH:mm') AS tokyo,
        |       DATE_FORMAT(o_orderdate + MAKE_DT_INTERVAL(CAST(o_orderkey % 5 AS INT),
        |                                                  CAST(o_orderkey % 24 AS INT), 30, 0),
        |                   'yyyy-MM-dd HH:mm:ss') AS shifted,
        |       CAST(CAST(o_orderdate AS DATE)
        |            + MAKE_YM_INTERVAL(0, CAST(o_orderkey % 13 AS INT)) AS STRING) AS plus_months
        |FROM dt2_src WHERE o_orderkey % 10 = 0 ORDER BY k""".stripMargin)
  }

  private val q209Sql =
    """SELECT o_orderkey AS k,
              date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS epoch_day,
              strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS d30,
              date_part('year', o_orderdate) AS yr,
              date_part('quarter', o_orderdate) AS qtr,
              strftime(timezone('America/Los_Angeles', CAST(o_orderdate AS TIMESTAMPTZ)),
                       '%Y-%m-%d %H:%M') AS la,
              strftime(timezone('Asia/Tokyo', CAST(o_orderdate AS TIMESTAMPTZ)),
                       '%Y-%m-%d %H:%M') AS tokyo,
              strftime(o_orderdate + to_days(CAST(o_orderkey % 5 AS INT))
                         + to_hours(CAST(o_orderkey % 24 AS INT)) + to_minutes(30),
                       '%Y-%m-%d %H:%M:%S') AS shifted,
              strftime(CAST(o_orderdate AS DATE)
                         + to_months(CAST(o_orderkey % 13 AS INT)), '%Y-%m-%d') AS plus_months
       FROM orders WHERE o_orderkey % 10 = 0 ORDER BY k"""

  // --------------------------------------------------------------------------
  // q210: runtime-introspection INVARIANTS — the functions whose raw output
  // is inherently nondeterministic (`uuid`, `monotonically_increasing_id`,
  // `spark_partition_id`, `input_file_name`, `version`) pinned by the
  // deterministic CONTRACTS they must satisfy, proven inside the query:
  // monotonic ids are globally unique, uuids are RFC-4122-shaped v4,
  // partition count is bounded by the session's shuffle parallelism, every
  // row has a source file, the version string is non-empty, and
  // `current_catalog` resolves. The oracle is the invariant vector itself —
  // all-true is the only correct answer at ANY scale or parallelism. One
  // aggregate pass, no scalar subqueries (subquery stages over a
  // nondeterministic-id CTE break under coalesced single-file writes).
  // --------------------------------------------------------------------------
  private def q210(s: SparkSession, d: String): DataFrame = {
    val src = T.orders(s, d)
    src.createOrReplaceTempView("meta_src")
    // spark_partition_id() is evaluated in the scan stage (pre-shuffle), so the
    // exact bound is the scan's own partition count — derived from the session,
    // never a literal, so file sizes / maxPartitionBytes / scale can't flip it.
    val scanParts = src.rdd.getNumPartitions
    s.sql(
      s"""WITH ids AS (
        |  SELECT MONOTONICALLY_INCREASING_ID() AS mid,
        |         SPARK_PARTITION_ID() AS pid,
        |         INPUT_FILE_NAME() AS f
        |  FROM meta_src)
        |SELECT
        |  COUNT(DISTINCT mid) = COUNT(*) AS mono_unique,
        |  UUID() RLIKE '^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$$'
        |    AS uuid_v4,
        |  COUNT(DISTINCT pid) <= $scanParts AS parts_bounded,
        |  MIN(LENGTH(f)) > 0 AS files_tracked,
        |  LENGTH(VERSION()) > 0 AS has_version,
        |  CURRENT_CATALOG() = 'spark_catalog' AS default_catalog
        |FROM ids ORDER BY 1""".stripMargin)
  }

  private val q210Sql =
    """SELECT true AS mono_unique, true AS uuid_v4, true AS parts_bounded,
              true AS files_tracked, true AS has_version, true AS default_catalog
       ORDER BY 1"""

  // --------------------------------------------------------------------------
  // q211: CSV SCALAR codec family — `to_csv` (struct → line, RFC-4180
  // quoting pinned by a field that ALWAYS embeds a comma), `from_csv`
  // (line → struct with explicit schema, closing the round trip so quoting
  // losslessness is hash-proven per row), and `schema_of_csv` /
  // `schema_of_json` (type INFERENCE as a scalar — the planted literals pin
  // the inference rules: int-vs-double promotion, JSON array element
  // widening). The per-row codec is the Kafka-payload shape: parse/serialize
  // inside the row pipeline, no separate file scan.
  // --------------------------------------------------------------------------
  private def q211(s: SparkSession, d: String): DataFrame = {
    T.orders(s, d).createOrReplaceTempView("csv_src")
    s.sql(
      """WITH src AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st,
        |         CONCAT(o_orderstatus, ',', CAST(o_orderkey AS STRING)) AS note
        |  FROM csv_src WHERE o_orderkey % 10 = 0),
        |lines AS (
        |  SELECT k, st, note,
        |         TO_CSV(NAMED_STRUCT('k', k, 'st', st, 'note', note)) AS line
        |  FROM src)
        |SELECT k, line,
        |       FROM_CSV(line, 'k BIGINT, st STRING, note STRING').note AS note_rt,
        |       FROM_CSV(line, 'k BIGINT, st STRING, note STRING').k AS k_rt,
        |       SCHEMA_OF_CSV('1,a,2.5') AS s_csv,
        |       SCHEMA_OF_JSON('{"a":1,"b":[1.5],"c":"x"}') AS s_json
        |FROM lines ORDER BY k""".stripMargin)
  }

  private val q211Sql =
    """SELECT o_orderkey AS k,
              CAST(o_orderkey AS VARCHAR) || ',' || o_orderstatus || ',"'
                || o_orderstatus || ',' || CAST(o_orderkey AS VARCHAR) || '"' AS line,
              o_orderstatus || ',' || CAST(o_orderkey AS VARCHAR) AS note_rt,
              o_orderkey AS k_rt,
              'STRUCT<_c0: INT, _c1: STRING, _c2: DOUBLE>' AS s_csv,
              'STRUCT<a: BIGINT, b: ARRAY<DOUBLE>, c: STRING>' AS s_json
       FROM orders WHERE o_orderkey % 10 = 0 ORDER BY k"""

  // --------------------------------------------------------------------------
  // q212: `stack` generator (the n-way columns→rows literal unpivot — q179's
  // UNPIVOT clause and q77's Dataset.unpivot cover the resolved forms; stack
  // is the Hive-surface generator) pipelined into per-row JVM REFLECTION
  // (`reflect` / `java_method` — arbitrary static-method escape hatch,
  // pinned against arithmetic the oracle reproduces: Long.toHexString vs
  // lower(to_hex), Math.floorMod vs %). Generator + codegen'd scalars in one
  // pass; the oracle rebuilds the stack with UNION ALL.
  // --------------------------------------------------------------------------
  private def q212(s: SparkSession, d: String): DataFrame = {
    T.orders(s, d).createOrReplaceTempView("stack_src")
    s.sql(
      """WITH src AS (
        |  SELECT o_orderkey AS k,
        |         CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM stack_src WHERE o_orderkey % 10 = 0)
        |SELECT k, t.tag, t.val,
        |       REFLECT('java.lang.Long', 'toHexString', cents) AS hex_r,
        |       CAST(JAVA_METHOD('java.lang.Math', 'floorMod', k, 7L) AS BIGINT) AS fm
        |FROM src LATERAL VIEW STACK(2, 'cents', cents, 'double_k', k * 2) t AS tag, val
        |ORDER BY k, tag""".stripMargin)
  }

  private val q212Sql =
    """WITH src AS (
         SELECT o_orderkey AS k,
                CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
         FROM orders WHERE o_orderkey % 10 = 0),
       stacked AS (
         SELECT k, 'cents' AS tag, cents AS val, cents FROM src
         UNION ALL
         SELECT k, 'double_k' AS tag, k * 2 AS val, cents FROM src)
       SELECT k, tag, val,
              lower(to_hex(cents)) AS hex_r,
              k % 7 AS fm
       FROM stacked ORDER BY k, tag"""

  val defs: Seq[QDef] = Seq(
    QDef("q202_string_surgery", q202, Some(q202Sql)),
    QDef("q203_format_roundtrip", q203, Some(q203Sql)),
    QDef("q204_safe_arithmetic", q204, Some(q204Sql)),
    QDef("q205_xpath_roundtrip", q205, Some(q205Sql)),
    QDef("q206_url_codec", q206, Some(q206Sql)),
    QDef("q207_array_construction", q207, Some(q207Sql)),
    QDef("q208_scalar_misc", q208, Some(q208Sql)),
    QDef("q209_datetime_completion", q209, Some(q209Sql)),
    QDef("q210_runtime_invariants", q210, Some(q210Sql)),
    QDef("q211_csv_scalar_codec", q211, Some(q211Sql)),
    QDef("q212_stack_reflect", q212, Some(q212Sql)))
}
