package graft.queries

import graft.{QDef, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-20 declared queries: top-k segment pruning generalized — zone
  * containment of NON-sort-column predicates (the real curation query) and
  * STRING sort columns — plus the computed-key materialized-view rewrite.
  * TopKPruneSpec / MvRewriteSpec own the plan shapes (which segments plan,
  * which relation serves); these oracle gates own the answers. */
object Round22Queries {

  private def sfTag(sfDir: String): String = Integer.toHexString(sfDir.hashCode)

  // --------------------------------------------------------------------------
  // q312: CURATION TOP-K — `WHERE lang = 'en' AND n_chars >= 60 ORDER BY
  // score DESC LIMIT k` over a lang-PARTITIONED, score-banded corpus table:
  // the daily training-data pick. Partition-pure segments are fully
  // contained under the lang equality (zone containment, r20), so they
  // vouch for τ minus their null counts; the n_chars floor composes the
  // same way per band. The injected τ bound then zone-prunes every segment
  // whose score range can't reach the cut — at 100 TB the query reads a few
  // segments of one language instead of the corpus. The filter covers two
  // NON-sort columns plus the sort column: exactly the shape r19 refused.
  // --------------------------------------------------------------------------
  private def q312(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    val src = s"r22_docs_${sfTag(d)}"
    T.documents(s, d).createOrReplaceTempView(src)
    val t = s"r312_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t
              (doc_id BIGINT, lang STRING, n_chars BIGINT, score BIGINT)
              USING parquet PARTITIONED BY (lang)""")
    // three score bands x one segment per lang value (the partition router):
    // a clustered/banded score layout inside each language
    Seq("n_chars < 150", "n_chars >= 150 AND n_chars < 300", "n_chars >= 300")
      .foreach { band =>
        s.sql(s"""INSERT INTO graft.lake.$t
          SELECT doc_id, lang, n_chars,
                 n_chars * 1000 + doc_id % 1000 AS score
          FROM $src WHERE $band""")
      }
    s.sql(s"""SELECT doc_id, score FROM graft.lake.$t
              WHERE lang = 'en' AND n_chars >= 60
              ORDER BY score DESC, doc_id LIMIT 50""")
  }

  private val q312Sql =
    """SELECT doc_id, n_chars * 1000 + doc_id % 1000 AS score
       FROM documents WHERE lang = 'en' AND n_chars >= 60
       ORDER BY score DESC, doc_id LIMIT 50"""

  // --------------------------------------------------------------------------
  // q313: STRING TOP-K SEGMENT PRUNING (r20) — `ORDER BY url DESC LIMIT k`
  // with a STRING sort column: τ is built from the segments' exactness-
  // flagged ASCII string bounds (self-written footers; foreign add_files
  // brackets never vouch — TopKPruneSpec pins that) and injected as a
  // string comparison, so collation top-k ("last k URLs") prunes exactly
  // like an integer score. Layout: one segment per source prefix, giving
  // disjoint collation bands.
  // --------------------------------------------------------------------------
  private def q313(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    val src = s"r22_docs_${sfTag(d)}"
    T.documents(s, d).createOrReplaceTempView(src)
    val t = s"r313_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"CREATE TABLE graft.lake.$t (doc_id BIGINT, url STRING) USING parquet")
    // collation bands by source id parity-ish split: three inserts, three
    // segments with disjoint [min,max] url ranges (src1* < src2-or-less... the
    // bands are the lexicographic thirds of the source space)
    Seq("source < 'src2'", "source >= 'src2' AND source < 'src6'", "source >= 'src6'")
      .foreach { band =>
        s.sql(s"""INSERT INTO graft.lake.$t
          SELECT doc_id, concat(source, '/', lpad(CAST(doc_id AS STRING), 8, '0')) AS url
          FROM $src WHERE $band""")
      }
    s.sql(s"SELECT doc_id, url FROM graft.lake.$t ORDER BY url DESC LIMIT 50")
  }

  private val q313Sql =
    """SELECT doc_id, source || '/' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS url
       FROM documents ORDER BY url DESC LIMIT 50"""

  val defs: Seq[QDef] = Seq(
    QDef("q312_curation_topk_containment", q312, Some(q312Sql)),
    QDef("q313_string_topk_pruning", q313, Some(q313Sql)),
  )
}
