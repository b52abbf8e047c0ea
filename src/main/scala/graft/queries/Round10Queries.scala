package graft.queries

import graft.{QDef, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 surface: remaining daily-driver families nothing in q01–q182
  * exercised — Spark 4's SQL PIPE syntax (the |> operator chain, SPARK-49555),
  * the ranking-window completion family (`percent_rank` / `cume_dist` /
  * `nth_value`), the binary↔text codec family (base64 / hex / hashes — the
  * payload-fingerprint shapes every ingestion pipeline runs), array SET
  * algebra (`array_intersect` / `array_union` / `array_except` with
  * relational-set-op oracles), the SQL-standard `timestampadd` /
  * `timestampdiff` pair, and the trig/log math extension family.
  *
  * All queries follow the SURVEY.md §2b determinism conventions (trailing
  * total-order sort, integer or ROUND(x,2) outputs, DuckDB HUGEINT casts).
  */
object Round10Queries {

  // --------------------------------------------------------------------------
  // q183: SQL PIPE syntax (Spark 4, SPARK-49555) — the linear `FROM … |> WHERE
  // … |> AGGREGATE … |> ORDER BY` form of the q01 pricing-summary shape.
  // Pipe syntax is resolution-time sugar: it must plan EXACTLY the classic
  // query (scan → pushed filter → partial/final hash agg → sort), so the
  // oracle is the classic form and the hash proves the two surfaces agree.
  // --------------------------------------------------------------------------
  private def q183(s: SparkSession, d: String): DataFrame = {
    T.lineitem(s, d).createOrReplaceTempView("pipe_li")
    s.sql(
      """FROM pipe_li
        ||> WHERE l_shipdate <= DATE'1998-09-02'
        ||> AGGREGATE COUNT(*) AS n,
        |             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |             CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c
        |   GROUP BY l_returnflag, l_linestatus
        ||> ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  private val q183Sql =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
              CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
              CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c
       FROM lineitem WHERE l_shipdate <= DATE'1998-09-02'
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus"""

  // --------------------------------------------------------------------------
  // q184: ranking-window completion — `percent_rank` (relative rank in
  // [0,1]), `cume_dist` (CDF position), `nth_value` (k-th row's value within
  // the frame) complete the q14 family. Ordering is (acctbal, custkey) so
  // every rank is total-order deterministic; fractions scale to integer
  // x100000 so the hash is float-free. One window pass per partition — the
  // filter to every-25th customer applies AFTER the windows, so both engines
  // rank over identical full partitions.
  // --------------------------------------------------------------------------
  private def q184(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    T.customer(s, d)
      .select(col("c_mktsegment").as("seg"), col("c_custkey").as("cust"),
        round(percent_rank().over(w) * 100000).cast("long").as("pr_x100k"),
        round(cume_dist().over(w) * 100000).cast("long").as("cd_x100k"),
        nth_value(col("c_custkey"), 3).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("third_cust"))
      .where(col("cust") % 25 === 0)
      .orderBy(col("seg"), col("cust"))
  }

  private val q184Sql =
    """SELECT * FROM (
         SELECT c_mktsegment AS seg, c_custkey AS cust,
                CAST(ROUND(PERCENT_RANK() OVER w * 100000, 0) AS BIGINT) AS pr_x100k,
                CAST(ROUND(CUME_DIST() OVER w * 100000, 0) AS BIGINT) AS cd_x100k,
                NTH_VALUE(c_custkey, 3) OVER
                  (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_cust
         FROM customer
         WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey))
       WHERE cust % 25 = 0
       ORDER BY seg, cust"""

  // --------------------------------------------------------------------------
  // q185: binary↔text codec family — `base64`/`unbase64`, `hex`/`unhex`,
  // `ascii`/`char`, `md5`/`sha2` — the payload-fingerprint and wire-encoding
  // scalar surface (content addressing q84/q97 uses md5 through; this is the
  // full family as first-class scalars, round-trips proven lossless inside
  // the query). All codegen'd per-row expressions; the only shuffle is the
  // final aggregate.
  // --------------------------------------------------------------------------
  private def q185(s: SparkSession, d: String): DataFrame =
    T.orders(s, d)
      .where(col("o_orderkey") % 20 === 0)
      .select(
        col("o_orderkey").as("k"),
        col("o_orderpriority").as("prio"),
        base64(col("o_orderpriority").cast("binary")).as("prio_b64"),
        // decode(unbase64(base64(x))) == x: the round trip inside the query
        decode(unbase64(base64(col("o_orderpriority").cast("binary"))), "UTF-8")
          .as("prio_rt"),
        lower(hex(col("o_orderpriority").cast("binary"))).as("prio_hex"),
        decode(unhex(lower(hex(col("o_orderpriority").cast("binary")))), "UTF-8")
          .as("prio_hex_rt"),
        ascii(col("o_orderstatus")).as("st_ascii"),
        md5(col("o_orderpriority").cast("binary")).as("prio_md5"),
        sha2(col("o_orderpriority").cast("binary"), 256).as("prio_sha256"))
      .orderBy(col("k"))

  private val q185Sql =
    """SELECT o_orderkey AS k, o_orderpriority AS prio,
              to_base64(ENCODE(o_orderpriority)) AS prio_b64,
              DECODE(from_base64(to_base64(ENCODE(o_orderpriority)))) AS prio_rt,
              lower(hex(ENCODE(o_orderpriority))) AS prio_hex,
              DECODE(unhex(lower(hex(ENCODE(o_orderpriority))))) AS prio_hex_rt,
              ascii(o_orderstatus) AS st_ascii,
              md5(o_orderpriority) AS prio_md5,
              sha256(o_orderpriority) AS prio_sha256
       FROM orders WHERE o_orderkey % 20 = 0
       ORDER BY k"""

  // --------------------------------------------------------------------------
  // q186: array SET algebra — `array_intersect` / `array_union` /
  // `array_except` / `array_distinct` over per-group collected sets. The
  // oracle never sees an array: it reproduces every size with RELATIONAL set
  // operations (INTERSECT / UNION / EXCEPT over DISTINCT pairs), so the hash
  // pins Spark's array algebra to the textbook set semantics. Per-group
  // arrays are line-number-sized (≤7), so collect_set is bounded — the shape
  // survives any corpus size because cardinality is per-GROUP, not per-table.
  // --------------------------------------------------------------------------
  private def q186(s: SparkSession, d: String): DataFrame = {
    val li = T.lineitem(s, d)
    val a = li.where(col("l_quantity") < 25)
      .groupBy(col("l_returnflag").as("rf"))
      .agg(collect_set(col("l_linenumber")).as("xs"))
    val b = li.where(col("l_discount") > 0.05)
      .groupBy(col("l_returnflag").as("rf"))
      .agg(collect_set(col("l_linenumber")).as("ys"))
    a.join(b, "rf")
      .select(col("rf"),
        size(array_intersect(col("xs"), col("ys"))).as("n_both"),
        size(array_union(col("xs"), col("ys"))).as("n_either"),
        size(array_except(col("xs"), col("ys"))).as("n_only_a"),
        size(array_distinct(concat(col("xs"), col("ys")))).as("n_distinct_concat"),
        aggregate(array_sort(array_union(col("xs"), col("ys"))),
          lit(0L), (acc, x) => acc + x).as("union_sum"))
      .orderBy(col("rf"))
  }

  private val q186Sql =
    """WITH a AS (SELECT DISTINCT l_returnflag AS rf, l_linenumber AS ln
                  FROM lineitem WHERE l_quantity < 25),
         b AS (SELECT DISTINCT l_returnflag AS rf, l_linenumber AS ln
               FROM lineitem WHERE l_discount > 0.05),
         i AS (SELECT rf, COUNT(*) AS n FROM (FROM a INTERSECT FROM b) GROUP BY rf),
         u AS (SELECT rf, COUNT(*) AS n, CAST(SUM(ln) AS BIGINT) AS s
               FROM (FROM a UNION FROM b) GROUP BY rf),
         e AS (SELECT rf, COUNT(*) AS n FROM (FROM a EXCEPT FROM b) GROUP BY rf)
       SELECT a_rf.rf, CAST(COALESCE(i.n, 0) AS INT) AS n_both,
              CAST(u.n AS INT) AS n_either,
              CAST(COALESCE(e.n, 0) AS INT) AS n_only_a,
              CAST(u.n AS INT) AS n_distinct_concat,
              u.s AS union_sum
       FROM (SELECT DISTINCT rf FROM a) a_rf
       JOIN u ON a_rf.rf = u.rf
       LEFT JOIN i ON a_rf.rf = i.rf
       LEFT JOIN e ON a_rf.rf = e.rf
       ORDER BY a_rf.rf"""

  // --------------------------------------------------------------------------
  // q187: SQL-standard `timestampadd` / `timestampdiff` — unit-explicit
  // timestamp arithmetic (the q22/q169 functions are Spark-dialect; these are
  // the portable forms ANSI pipelines write). hour_of_day is derived the
  // timestampdiff way (diff from the day's truncation), the +3 DAY shift goes
  // through timestampadd and lands as an epoch-day integer — both integral,
  // so the hash is float-free and timezone-honest (UTC session).
  // --------------------------------------------------------------------------
  private def q187(s: SparkSession, d: String): DataFrame =
    T.events(s, d)
      .select(col("event_type"),
        expr("timestampdiff(HOUR, date_trunc('day', ts), ts)").as("hour_of_day"),
        expr("datediff(CAST(timestampadd(DAY, 3, ts) AS DATE), DATE'1970-01-01')")
          .as("shifted_epoch_day"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("hour_of_day")).as("sum_hour"),
        sum(col("shifted_epoch_day")).as("sum_day"))
      .orderBy(col("event_type"))

  private val q187Sql =
    """SELECT event_type, COUNT(*) AS n,
              CAST(SUM(date_diff('hour', date_trunc('day', ts), ts)) AS BIGINT) AS sum_hour,
              CAST(SUM(date_diff('day', DATE'1970-01-01',
                                 CAST(ts + INTERVAL 3 DAY AS DATE))) AS BIGINT) AS sum_day
       FROM events GROUP BY event_type ORDER BY event_type"""

  // --------------------------------------------------------------------------
  // q188: math extension family — `atan2`, `degrees`/`radians`, `cbrt`,
  // `log2`/`log10`, `signum`, `hypot`-free (DuckDB lacks it) — the geometry /
  // log-scale scalar surface. Per-row ROUND to 6 decimals BEFORE the sum
  // bounds cross-engine float-association error to ~n·ulp, then the final
  // ROUND(x,2) follows the corpus convention. All codegen'd; one aggregate.
  // --------------------------------------------------------------------------
  private def q188(s: SparkSession, d: String): DataFrame =
    T.part(s, d)
      .select(col("p_brand"),
        round(atan2(col("p_retailprice"), col("p_size").cast("double")), 6).as("a"),
        round(degrees(radians(col("p_retailprice"))), 6).as("dr"),
        round(cbrt(col("p_retailprice")), 6).as("cr"),
        round(log2(col("p_retailprice")), 6).as("l2"),
        round(log10(col("p_retailprice")), 6).as("l10"),
        signum(col("p_size") - lit(25)).cast("long").as("sg"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("a")), 2).as("sum_atan2"),
        round(sum(col("dr")), 2).as("sum_degrad"),
        round(sum(col("cr")), 2).as("sum_cbrt"),
        round(sum(col("l2")), 2).as("sum_log2"),
        round(sum(col("l10")), 2).as("sum_log10"),
        sum(col("sg")).as("sum_sign"))
      .orderBy(col("p_brand"))

  private val q188Sql =
    """SELECT p_brand, COUNT(*) AS n,
              ROUND(SUM(ROUND(atan2(p_retailprice, CAST(p_size AS DOUBLE)), 6)), 2) AS sum_atan2,
              ROUND(SUM(ROUND(degrees(radians(p_retailprice)), 6)), 2) AS sum_degrad,
              ROUND(SUM(ROUND(cbrt(p_retailprice), 6)), 2) AS sum_cbrt,
              ROUND(SUM(ROUND(log2(p_retailprice), 6)), 2) AS sum_log2,
              ROUND(SUM(ROUND(log10(p_retailprice), 6)), 2) AS sum_log10,
              CAST(SUM(CAST(sign(p_size - 25) AS BIGINT)) AS BIGINT) AS sum_sign
       FROM part GROUP BY p_brand ORDER BY p_brand"""

  // --------------------------------------------------------------------------
  // q189: `json_tuple` + LATERAL VIEW — the Hive-surface MULTI-key JSON
  // extraction (q26's get_json_object pulls one path per call and re-parses
  // the document each time; json_tuple parses ONCE and emits every requested
  // key as a generator row). Over events.props; missing keys surface as NULL,
  // pinned by the q2-style null aggregate. DuckDB twin re-extracts with
  // json_extract_string per key — the hash proves the one-parse generator
  // agrees with per-path extraction.
  // --------------------------------------------------------------------------
  private def q189(s: SparkSession, d: String): DataFrame = {
    T.events(s, d).createOrReplaceTempView("jt_events")
    s.sql(
      """SELECT event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(k AS BIGINT)) AS BIGINT) AS sum_k,
        |       CAST(SUM(CASE WHEN missing IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null
        |FROM jt_events
        |LATERAL VIEW json_tuple(props, 'k', 'nope') jt AS k, missing
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  private val q189Sql =
    """SELECT event_type, COUNT(*) AS n,
              CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
              CAST(SUM(CASE WHEN json_extract_string(props, '$.nope') IS NULL
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_null
       FROM events GROUP BY event_type ORDER BY event_type"""

  // --------------------------------------------------------------------------
  // q190: grouping-set INTROSPECTION — `grouping()` (is this column rolled
  // up?) and `grouping_id()` (the bitmask) distinguish "NULL because rolled
  // up" from "NULL in the data", which q10/q11/q58's grouping sets queries
  // sidestepped with COALESCE labels. Both engines order bits identically
  // (first listed column = MSB), so the bitmask is hash-comparable as a
  // plain integer.
  // --------------------------------------------------------------------------
  private def q190(s: SparkSession, d: String): DataFrame =
    T.orders(s, d)
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderstatus")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping(col("o_orderstatus")).as("g_st"),
        grouping(col("o_orderpriority")).as("g_pr"),
        grouping_id().as("gid"),
        count(lit(1)).as("n"))
      .orderBy(col("gid"), col("o_orderstatus"), col("o_orderpriority"))

  private val q190Sql =
    """SELECT o_orderstatus, o_orderpriority,
              CAST(GROUPING(o_orderstatus) AS TINYINT) AS g_st,
              CAST(GROUPING(o_orderpriority) AS TINYINT) AS g_pr,
              CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
              COUNT(*) AS n
       FROM orders
       GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
       ORDER BY gid, o_orderstatus, o_orderpriority"""

  // --------------------------------------------------------------------------
  // q191: bitwise SCALAR family — `shiftleft` / `shiftright` / `^` / `&` /
  // `|` / `~` / `bit_count` (q170 covered the bit AGGREGATES; these are the
  // per-row operators hashing/bucketing/flag-packing code reaches for). All
  // integer-exact, so the hash needs no rounding convention at all.
  // --------------------------------------------------------------------------
  private def q191(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .select(col("l_returnflag"),
        shiftleft(col("l_linenumber"), 3).as("shl"),
        shiftright(col("l_orderkey"), 2).as("shr"),
        (col("l_orderkey").bitwiseXOR(col("l_partkey"))).as("x"),
        (col("l_orderkey").bitwiseAND(lit(255L))).as("lo"),
        (col("l_orderkey").bitwiseOR(col("l_linenumber"))).as("orr"),
        bitwise_not(col("l_suppkey")).as("inv"),
        bit_count(col("l_orderkey")).as("pop"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("shl")).as("sum_shl"), sum(col("shr")).as("sum_shr"),
        sum(col("x")).as("sum_xor"), sum(col("lo")).as("sum_and"),
        sum(col("orr")).as("sum_or"), sum(col("inv")).as("sum_not"),
        sum(col("pop")).as("sum_pop"))
      .orderBy(col("l_returnflag"))

  private val q191Sql =
    """SELECT l_returnflag, COUNT(*) AS n,
              CAST(SUM(l_linenumber << 3) AS BIGINT) AS sum_shl,
              CAST(SUM(l_orderkey >> 2) AS BIGINT) AS sum_shr,
              CAST(SUM(xor(l_orderkey, l_partkey)) AS BIGINT) AS sum_xor,
              CAST(SUM(l_orderkey & 255) AS BIGINT) AS sum_and,
              CAST(SUM(l_orderkey | l_linenumber) AS BIGINT) AS sum_or,
              CAST(SUM(~l_suppkey) AS BIGINT) AS sum_not,
              CAST(SUM(CAST(bit_count(l_orderkey) AS BIGINT)) AS BIGINT) AS sum_pop
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  // --------------------------------------------------------------------------
  // q192: string-utility completion — `levenshtein` (with and without the
  // early-exit threshold form), `lpad`/`rpad`, `initcap`, `locate` — the
  // fuzzy-match and display-formatting staples q21/q174 didn't reach.
  // initcap has no DuckDB twin, so the oracle rebuilds it from
  // upper/lower/substr on the single-word column — byte-for-byte. The
  // threshold form's contract is pinned exactly: distance ≤ k returns the
  // distance, distance > k returns -1 (the early-exit sentinel — what makes
  // it O(k·n) instead of O(n²) inside q135-style fuzzy joins at scale).
  // --------------------------------------------------------------------------
  private def q192(s: SparkSession, d: String): DataFrame =
    T.customer(s, d)
      .where(col("c_custkey") % 25 === 0)
      .select(col("c_custkey").as("k"),
        levenshtein(col("c_mktsegment"), col("c_name")).as("lev"),
        levenshtein(col("c_mktsegment"), col("c_name"), 3).as("lev3"),
        lpad(col("c_mktsegment"), 14, ".").as("padded_l"),
        rpad(col("c_mktsegment"), 14, "_").as("padded_r"),
        initcap(lower(col("c_mktsegment"))).as("cap"),
        locate("U", col("c_mktsegment")).as("pos_u"))
      .orderBy(col("k"))

  private val q192Sql =
    """SELECT c_custkey AS k,
              levenshtein(c_mktsegment, c_name) AS lev,
              CASE WHEN levenshtein(c_mktsegment, c_name) > 3 THEN -1
                   ELSE levenshtein(c_mktsegment, c_name) END AS lev3,
              lpad(c_mktsegment, 14, '.') AS padded_l,
              rpad(c_mktsegment, 14, '_') AS padded_r,
              upper(substr(lower(c_mktsegment), 1, 1)) ||
                substr(lower(c_mktsegment), 2) AS cap,
              strpos(c_mktsegment, 'U') AS pos_u
       FROM customer WHERE c_custkey % 25 = 0
       ORDER BY k"""

  // --------------------------------------------------------------------------
  // q193: `width_bucket` equi-width binning — the SQL-standard histogram
  // primitive (q78 hand-rolled the same shape with FLOOR arithmetic; this is
  // the built-in, with its exact BOUNDARY contract pinned: below-range rows
  // land in bucket 0, at-or-above-range rows in bucket n+1). The upper bound
  // sits strictly inside the price domain, so the overflow bucket (13) is
  // provably exercised; bucket edges fall on non-terminating fractions no
  // cent-valued price can sit within 1e-3 of — float association noise
  // cannot flip a bucket. Oracle rebuilds the standard's CASE/FLOOR formula.
  // --------------------------------------------------------------------------
  private def q193(s: SparkSession, d: String): DataFrame =
    T.orders(s, d)
      .select(col("o_totalprice").as("v"),
        width_bucket(col("o_totalprice"), lit(900.0), lit(400000.0), lit(12L)).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        round(min(col("v")), 2).as("lo_v"),
        round(max(col("v")), 2).as("hi_v"))
      .orderBy(col("bucket"))

  private val q193Sql =
    """SELECT CASE WHEN o_totalprice < 900.0 THEN 0
                   WHEN o_totalprice >= 400000.0 THEN 13
                   ELSE 1 + CAST(FLOOR((o_totalprice - 900.0)
                                       / ((400000.0 - 900.0) / 12)) AS BIGINT)
              END AS bucket,
              COUNT(*) AS n,
              ROUND(MIN(o_totalprice), 2) AS lo_v,
              ROUND(MAX(o_totalprice), 2) AS hi_v
       FROM orders GROUP BY bucket ORDER BY bucket"""

  // --------------------------------------------------------------------------
  // q194: `conv` radix conversion — decimal↔hex↔binary string forms (content
  // hashing, bitmap debugging, URL-safe id rendering all reach for it). The
  // hex→decimal leg closes the round trip INSIDE the query, so the hash pins
  // both directions at once. Oracle: DuckDB's to_base, with the round-trip
  // leg reproduced as the identity on the decimal rendering.
  // --------------------------------------------------------------------------
  private def q194(s: SparkSession, d: String): DataFrame =
    T.orders(s, d)
      .where(col("o_orderkey") % 20 === 0)
      .select(col("o_orderkey").as("k"),
        conv(col("o_orderkey").cast("string"), 10, 16).as("k16"),
        conv(conv(col("o_orderkey").cast("string"), 10, 16), 16, 10).as("k_rt"),
        conv(col("o_orderkey").cast("string"), 10, 2).as("k2"))
      .orderBy(col("k"))

  private val q194Sql =
    """SELECT o_orderkey AS k,
              to_base(o_orderkey, 16) AS k16,
              CAST(o_orderkey AS VARCHAR) AS k_rt,
              to_base(o_orderkey, 2) AS k2
       FROM orders WHERE o_orderkey % 20 = 0
       ORDER BY k"""

  // --------------------------------------------------------------------------
  // q195: map CONSTRUCTION completion — `map_from_arrays`, `map(...)`,
  // `map_concat`, `map_entries` (q26/q130 covered lookup and the HOFs; this
  // is the build-and-flatten direction a feature-bag pipeline runs: assemble
  // per-row feature maps, concat sources, explode entries back to long form
  // and aggregate). The oracle never builds a map: it reproduces the
  // flattened (group, key, sum) rollup with a UNION ALL — the hash pins
  // entry ordering out (aggregation is order-free) while pinning content.
  // --------------------------------------------------------------------------
  private def q195(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .select(col("l_returnflag").as("rf"),
        map_concat(
          map_from_arrays(
            array(lit("qty"), lit("price_c")),
            array(col("l_quantity").cast("long"),
              floor(col("l_extendedprice") * 100).cast("long"))),
          map(lit("disc_bp"), floor(col("l_discount") * 10000).cast("long")))
          .as("features"))
      .select(col("rf"), explode(map_entries(col("features"))).as("e"))
      .groupBy(col("rf"), col("e.key").as("feature"))
      .agg(count(lit(1)).as("n"), sum(col("e.value")).as("total"))
      .orderBy(col("rf"), col("feature"))

  private val q195Sql =
    """WITH long_form AS (
         SELECT l_returnflag AS rf, 'qty' AS feature,
                CAST(l_quantity AS BIGINT) AS v FROM lineitem
         UNION ALL
         SELECT l_returnflag, 'price_c',
                CAST(FLOOR(l_extendedprice * 100) AS BIGINT) FROM lineitem
         UNION ALL
         SELECT l_returnflag, 'disc_bp',
                CAST(FLOOR(l_discount * 10000) AS BIGINT) FROM lineitem)
       SELECT rf, feature, COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS total
       FROM long_form GROUP BY rf, feature ORDER BY rf, feature"""

  // --------------------------------------------------------------------------
  // q196: `DataFrame.stat.crosstab` — the contingency-table reshape (pair
  // frequency matrix in one pass; the EDA sibling of q62's pivot). Column
  // NAMES come from the second column's values, so the oracle pivots with
  // CASE sums under the same names; the driver's sorted-column hash makes
  // name agreement the whole contract.
  // --------------------------------------------------------------------------
  private def q196(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d).stat.crosstab("l_returnflag", "l_linestatus")
      .orderBy(col("l_returnflag_l_linestatus"))

  private val q196Sql =
    """SELECT l_returnflag AS l_returnflag_l_linestatus,
              CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
              CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O
       FROM lineitem GROUP BY l_returnflag
       ORDER BY l_returnflag_l_linestatus"""

  // --------------------------------------------------------------------------
  // q197: the `DataFrameNaFunctions` surface — `na.fill` (null → default),
  // `na.replace` (value remap, nulls pass through untouched), `na.drop`
  // (row filter on remaining nulls) — the missing-data triage every tabular
  // pipeline runs before training. Nulls are PLANTED in-query (NULLIF), so
  // the oracle reconstructs each step with CASE/COALESCE/WHERE and the hash
  // pins the exact null-handling order of operations.
  // --------------------------------------------------------------------------
  private def q197(s: SparkSession, d: String): DataFrame = {
    val planted = T.orders(s, d)
      .select(col("o_orderkey").as("k"),
        when(col("o_orderkey") % 7 === 0, lit(null))
          .otherwise(col("o_totalprice")).as("bal"),
        when(col("o_orderkey") % 5 === 0, lit(null))
          .otherwise(col("o_orderstatus")).as("tag"))
    planted.na.fill(Map("bal" -> 0.0))
      .na.replace("tag", Map("O" -> "OPEN"))
      .na.drop(Seq("tag"))
      .groupBy(col("tag"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("bal") * 100).cast("long")).as("bal_c"))
      .orderBy(col("tag"))
  }

  private val q197Sql =
    """WITH planted AS (
         SELECT o_orderkey AS k,
                CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_totalprice END AS bal,
                CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_orderstatus END AS tag
         FROM orders),
       filled AS (
         SELECT k, COALESCE(bal, 0.0) AS bal,
                CASE WHEN tag = 'O' THEN 'OPEN' ELSE tag END AS tag
         FROM planted)
       SELECT tag, COUNT(*) AS n,
              CAST(SUM(CAST(FLOOR(bal * 100) AS BIGINT)) AS BIGINT) AS bal_c
       FROM filled WHERE tag IS NOT NULL
       GROUP BY tag ORDER BY tag"""

  // --------------------------------------------------------------------------
  // q198: the SQL `IDENTIFIER()` clause (SPARK-43205) — injection-safe SQL
  // templating: table and column references resolved from string values at
  // analysis time (the parameterized-DDL/reporting-template shape; string
  // concatenation into SQL is the anti-pattern this clause exists to kill).
  // Resolution-time sugar: the oracle is the statically-written query.
  // --------------------------------------------------------------------------
  private def q198(s: SparkSession, d: String): DataFrame = {
    T.orders(s, d).createOrReplaceTempView("ident_orders")
    s.sql(
      """SELECT IDENTIFIER('o_orderstatus') AS st, COUNT(*) AS n,
        |       CAST(SUM(CAST(FLOOR(IDENTIFIER('o_totalprice') * 100) AS BIGINT)) AS BIGINT)
        |         AS total_c
        |FROM IDENTIFIER('ident_orders')
        |GROUP BY IDENTIFIER('o_orderstatus')
        |ORDER BY st""".stripMargin)
  }

  private val q198Sql =
    """SELECT o_orderstatus AS st, COUNT(*) AS n,
              CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
       FROM orders GROUP BY o_orderstatus ORDER BY st"""

  // --------------------------------------------------------------------------
  // q199: parameterized SQL (`spark.sql(text, args)`, SPARK-44140) — NAMED
  // parameter markers bound server-side, the injection-safe twin of q198 for
  // VALUES: markers are typed literals at parse time, never string splices.
  // The oracle inlines the same constants statically.
  // --------------------------------------------------------------------------
  private def q199(s: SparkSession, d: String): DataFrame = {
    T.lineitem(s, d).createOrReplaceTempView("param_li")
    s.sql(
      """SELECT l_returnflag AS rf, COUNT(*) AS n,
        |       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |FROM param_li
        |WHERE l_quantity < :qmax AND l_discount BETWEEN :dlo AND :dhi
        |GROUP BY l_returnflag ORDER BY rf""".stripMargin,
      Map("qmax" -> 25, "dlo" -> 0.02, "dhi" -> 0.08))
  }

  private val q199Sql =
    """SELECT l_returnflag AS rf, COUNT(*) AS n,
              CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
       FROM lineitem
       WHERE l_quantity < 25 AND l_discount BETWEEN 0.02 AND 0.08
       GROUP BY l_returnflag ORDER BY rf"""

  val defs: Seq[QDef] = Seq(
    QDef("q183_pipe_syntax", q183, Some(q183Sql)),
    QDef("q184_rank_completion", q184, Some(q184Sql)),
    QDef("q185_codec_family", q185, Some(q185Sql)),
    QDef("q186_array_set_algebra", q186, Some(q186Sql)),
    QDef("q187_timestamp_arithmetic", q187, Some(q187Sql)),
    QDef("q188_math_extensions", q188, Some(q188Sql)),
    QDef("q189_json_tuple", q189, Some(q189Sql)),
    QDef("q190_grouping_introspection", q190, Some(q190Sql)),
    QDef("q191_bitwise_scalars", q191, Some(q191Sql)),
    QDef("q192_string_utilities", q192, Some(q192Sql)),
    QDef("q193_width_bucket", q193, Some(q193Sql)),
    QDef("q194_radix_conversion", q194, Some(q194Sql)),
    QDef("q195_map_construction", q195, Some(q195Sql)),
    QDef("q196_crosstab", q196, Some(q196Sql)),
    QDef("q197_na_functions", q197, Some(q197Sql)),
    QDef("q198_identifier_clause", q198, Some(q198Sql)),
    QDef("q199_parameterized_sql", q199, Some(q199Sql)))
}
