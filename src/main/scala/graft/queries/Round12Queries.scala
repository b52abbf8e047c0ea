package graft.queries

import graft.{QDef, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 surface: the SQL clauses and scalar families still unpinned
  * after q01–q214 — `TABLESAMPLE` (the one SQL clause the round-8 audit
  * left open: seeded Bernoulli row sampling, rows-only + property-spec'd
  * like every nondeterministic-output operator), printf-style formatting
  * (`format_string` / `find_in_set` / `left` / `right` / `repeat`), array
  * MEMBERSHIP completion (`array_position` / `array_remove` /
  * `array_compact` / `array_prepend` / `array_append` / `flatten`), and the
  * crypto codec surface (`aes_encrypt`/`aes_decrypt` ECB round trip pinned
  * by identity, `md5` / `sha2` digests hash-matched against the oracle's
  * own implementations — the content-addressing shape exact dedup runs on).
  *
  * All queries follow the SURVEY.md §2b determinism conventions (trailing
  * total-order sort, integer or ROUND(x,2) outputs, DuckDB HUGEINT casts).
  */
object Round12Queries {

  // --------------------------------------------------------------------------
  // q215: SQL TABLESAMPLE — seeded BERNOULLI row sampling as a SCAN clause
  // (`TABLESAMPLE (10 PERCENT) REPEATABLE (42)`), the survey's one unpinned
  // SQL clause. Output is nondeterministic-by-design across configs (the
  // sample depends on the scan's split layout), so the query is declared
  // rows-only like q71's sampleBy; Round12Spec pins the properties that ARE
  // deterministic: same seed ⇒ identical sample, sampled fraction within
  // binomial bounds, and the sample is a true subset (every sampled key
  // exists in the source). Per-flag aggregation keeps the output small and
  // rows-only-stable (3 groups at every scale).
  // --------------------------------------------------------------------------
  private def q215(s: SparkSession, d: String): DataFrame = {
    T.lineitem(s, d).createOrReplaceTempView("ts215_src")
    s.sql("""SELECT l_returnflag AS rf, COUNT(*) AS n_sampled,
                    CAST(SUM(l_quantity) AS BIGINT) AS qty_sampled
             FROM (SELECT l_returnflag, l_quantity
                   FROM ts215_src TABLESAMPLE (10 PERCENT) REPEATABLE (42))
             GROUP BY 1 ORDER BY 1""")
  }

  // --------------------------------------------------------------------------
  // q216: printf-style formatting family — `format_string` (C-style %05d/%.2f
  // templating, the log-line / report shape), `find_in_set` (1-based position
  // in a comma-delimited set, 0 when absent — both arms exercised),
  // `left`/`right` (fixed-width prefix/suffix), `repeat`. The oracle rebuilds
  // each from primitives: DuckDB printf for format_string, list_position over
  // str_split for find_in_set (coalesced to 0 on miss), left/right/repeat
  // natively. Codegen'd scalars; one WholeStageCodegen span.
  // --------------------------------------------------------------------------
  private def q216(s: SparkSession, d: String): DataFrame =
    T.orders(s, d).where(col("o_orderkey") % 10 === 0)
      .select(
        col("o_orderkey").as("k"),
        format_string("%07d|%s|%.2f", col("o_orderkey"), col("o_orderstatus"),
          round(col("o_totalprice"), 2)).as("line"),
        expr("find_in_set(o_orderstatus, 'F,O,P')").as("pos_all"),
        expr("find_in_set(o_orderstatus, 'O,P')").as("pos_missing_f"),
        expr("left(concat('Order#', lpad(CAST(o_orderkey AS STRING), 9, '0')), 8)")
          .as("tag_l"),
        expr("right(lpad(CAST(o_orderkey AS STRING), 9, '0'), 3)").as("tag_r"),
        repeat(col("o_orderstatus"), 3).as("st3"))
      .orderBy("k")

  private val q216Sql =
    """SELECT o_orderkey AS k,
              printf('%07d|%s|%.2f', o_orderkey, o_orderstatus,
                     ROUND(o_totalprice, 2)) AS line,
              CAST(COALESCE(list_position(str_split('F,O,P', ','), o_orderstatus), 0)
                AS INT) AS pos_all,
              CAST(COALESCE(list_position(str_split('O,P', ','), o_orderstatus), 0)
                AS INT) AS pos_missing_f,
              left('Order#' || lpad(CAST(o_orderkey AS VARCHAR), 9, '0'), 8) AS tag_l,
              right(lpad(CAST(o_orderkey AS VARCHAR), 9, '0'), 3) AS tag_r,
              repeat(o_orderstatus, 3) AS st3
       FROM orders WHERE o_orderkey % 10 = 0 ORDER BY k"""

  // --------------------------------------------------------------------------
  // q217: array MEMBERSHIP completion — `array_position` (1-based first
  // occurrence, 0 on miss: both arms planted), `array_remove` (all
  // occurrences of a value), `array_compact` (null removal), `array_prepend`
  // / `array_append`, `flatten` (one nesting level). Arrays are planted from
  // key arithmetic so every row is a ground truth the oracle rebuilds with
  // DuckDB list primitives (list_position + coalesce, list_filter for
  // remove/compact, list_prepend/list_append, flatten). Every array output is
  // scalarized to a CSV string via array_join — the q13 convention
  // (RelationalQueries q13: collect_list "emitted as a CSV string") — because
  // the verification harness sorts result cells and cannot hash raw arrays.
  // --------------------------------------------------------------------------
  private def q217(s: SparkSession, d: String): DataFrame = {
    // q13 convention: array column -> deterministic CSV string
    def csv(arrExpr: String): org.apache.spark.sql.Column =
      expr(s"array_join(transform($arrExpr, x -> CAST(x AS STRING)), ',')")
    q217Src(s, d).where(col("o_orderkey") % 10 === 0)
      .select(
        col("o_orderkey").as("k"),
        csv("array(k7, k5, k7)").as("arr"),
        expr("array_position(array(k7, k5, k7), k7)").as("pos_hit"),
        expr("array_position(array(k7, k5, k7), 99L)").as("pos_miss"),
        csv("array_remove(array(k7, k5, k7), k7)").as("removed"),
        csv("array_compact(array(k7, CAST(NULL AS BIGINT), k5))").as("compacted"),
        csv("array_prepend(array(k7, k5), 100L)").as("prepended"),
        csv("array_append(array(k7, k5), 200L)").as("appended"),
        csv("flatten(array(array(k7), array(k5, k7)))").as("flat"))
      .orderBy("k")
  }

  // the planted per-row values: k7/k5 derive from the key so the oracle can
  // rebuild every array element exactly
  private def q217Src(s: SparkSession, d: String): DataFrame =
    T.orders(s, d).withColumn("k7", col("o_orderkey") % 7)
      .withColumn("k5", col("o_orderkey") % 5)

  private val q217Sql =
    """WITH src AS (
         SELECT o_orderkey AS k, o_orderkey % 7 AS k7, o_orderkey % 5 AS k5
         FROM orders WHERE o_orderkey % 10 = 0)
       SELECT k,
              array_to_string(list_transform([k7, k5, k7],
                x -> CAST(x AS VARCHAR)), ',') AS arr,
              CAST(COALESCE(list_position([k7, k5, k7], k7), 0) AS BIGINT) AS pos_hit,
              CAST(COALESCE(list_position([k7, k5, k7], 99), 0) AS BIGINT) AS pos_miss,
              COALESCE(array_to_string(list_transform(
                list_filter([k7, k5, k7], x -> x <> k7),
                x -> CAST(x AS VARCHAR)), ','), '') AS removed,
              array_to_string(list_transform(list_filter([k7, NULL, k5], x -> x IS NOT NULL),
                x -> CAST(x AS VARCHAR)), ',') AS compacted,
              array_to_string(list_transform(list_prepend(100, [k7, k5]),
                x -> CAST(x AS VARCHAR)), ',') AS prepended,
              array_to_string(list_transform(list_append([k7, k5], 200),
                x -> CAST(x AS VARCHAR)), ',') AS appended,
              array_to_string(list_transform(flatten([[k7], [k5, k7]]),
                x -> CAST(x AS VARCHAR)), ',') AS flat
       FROM src ORDER BY k"""

  // --------------------------------------------------------------------------
  // q218: crypto codec surface — `aes_encrypt`/`aes_decrypt` (AES-128 ECB:
  // the DETERMINISTIC mode, so decrypt∘encrypt is an identity the hash can
  // pin per row; GCM's random IV is exactly why it is not used here) and the
  // digest pair `md5` / `sha2(…,256)` hash-matched against DuckDB's own
  // md5/sha256 — the content-addressing primitives q34's exact dedup and
  // q84's hash split build on, here pinned engine-vs-engine. The ciphertext
  // itself leaves the query only through the round trip (the oracle cannot
  // run AES); its LENGTH is pinned — ECB pads to the 16-byte block grid.
  // --------------------------------------------------------------------------
  private def q218(s: SparkSession, d: String): DataFrame =
    T.orders(s, d).where(col("o_orderkey") % 10 === 0)
      .withColumn("payload",
        expr("concat(o_orderstatus, '|', CAST(o_orderkey AS STRING))"))
      .select(
        col("o_orderkey").as("k"),
        col("payload").as("orig"),
        expr("CAST(aes_decrypt(aes_encrypt(payload, '0123456789abcdef', 'ECB'), " +
          "'0123456789abcdef', 'ECB') AS STRING)").as("decrypted"),
        expr("length(aes_encrypt(payload, '0123456789abcdef', 'ECB'))").as("ct_len"),
        md5(col("payload")).as("payload_md5"),
        sha2(col("payload"), 256).as("payload_sha256"))
      .orderBy("k")

  private val q218Sql =
    """WITH src AS (
         SELECT o_orderkey AS k,
                o_orderstatus || '|' || CAST(o_orderkey AS VARCHAR) AS payload
         FROM orders WHERE o_orderkey % 10 = 0)
       SELECT k, payload AS orig, payload AS decrypted,
              CAST(((length(payload) // 16) + 1) * 16 AS INT) AS ct_len,
              md5(payload) AS payload_md5,
              sha256(payload) AS payload_sha256
       FROM src ORDER BY k"""

  // --------------------------------------------------------------------------
  // q219: SQL session VARIABLES (SPARK-46913, Spark 4 `DECLARE` / `SET VAR`) —
  // typed session state referenced from a later query: the parameterized-
  // report shape where thresholds live in variables, not string-spliced SQL
  // (q199's `spark.sql(text, args)` is the API twin; this is the pure-SQL
  // surface). A variable is SET from a scalar SUBQUERY over the data (the
  // median-ish pivot price), then the report filters by it — so the oracle
  // must reproduce the whole two-step computation relationally.
  // --------------------------------------------------------------------------
  private def q219(s: SparkSession, d: String): DataFrame = {
    T.orders(s, d).createOrReplaceTempView("v219_src")
    s.sql("DECLARE OR REPLACE VARIABLE q219_cut DOUBLE")
    s.sql("SET VAR q219_cut = (SELECT AVG(o_totalprice) FROM v219_src)")
    s.sql("DECLARE OR REPLACE VARIABLE q219_flag STRING DEFAULT 'O'")
    s.sql("""SELECT o_orderstatus AS st, COUNT(*) AS n_above,
                    CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
                    BOOL_OR(o_orderstatus = q219_flag) AS has_flag
             FROM v219_src WHERE o_totalprice > q219_cut
             GROUP BY st ORDER BY st""")
  }

  private val q219Sql =
    """SELECT o_orderstatus AS st, COUNT(*) AS n_above,
              CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
              BOOL_OR(o_orderstatus = 'O') AS has_flag
       FROM orders WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
       GROUP BY st ORDER BY st"""

  // --------------------------------------------------------------------------
  // q220: `EXECUTE IMMEDIATE` (SPARK-44751) — dynamic SQL with BIND
  // PARAMETERS (`?` positional via USING), the stored-procedure-style shape
  // for templated maintenance queries: the statement text is data, the
  // parameters are typed values, no string splicing (the injection-safe twin
  // of q198's IDENTIFIER and q199's parameterized API). The INTO-less form
  // returns the result set directly.
  // --------------------------------------------------------------------------
  private def q220(s: SparkSession, d: String): DataFrame = {
    T.lineitem(s, d).createOrReplaceTempView("v220_src")
    s.sql("""EXECUTE IMMEDIATE
               'SELECT l_returnflag AS rf, l_linestatus AS ls, COUNT(*) AS n,
                       CAST(SUM(l_quantity) AS BIGINT) AS qty
                FROM v220_src WHERE l_quantity > ? AND l_shipdate <= ?
                GROUP BY rf, ls ORDER BY rf, ls'
             USING 25, DATE'1998-09-02'""")
  }

  private val q220Sql =
    """SELECT l_returnflag AS rf, l_linestatus AS ls, COUNT(*) AS n,
              CAST(SUM(l_quantity) AS BIGINT) AS qty
       FROM lineitem WHERE l_quantity > 25 AND l_shipdate <= DATE '1998-09-02'
       GROUP BY rf, ls ORDER BY rf, ls"""

  val defs: Seq[QDef] = Seq(
    QDef("q215_tablesample", q215, None),
    QDef("q216_printf_family", q216, Some(q216Sql)),
    QDef("q217_array_membership", q217, Some(q217Sql)),
    QDef("q218_crypto_codec", q218, Some(q218Sql)),
    QDef("q219_sql_variables", q219, Some(q219Sql)),
    QDef("q220_execute_immediate", q220, Some(q220Sql)))
}
