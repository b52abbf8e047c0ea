package graft

/** Registry-level invariants that every future query addition must keep: they guard
  * the driver contract (SparkEntry) and the determinism conventions mechanically. */
class RegistrySpec extends SparkSpec {

  test("query names are unique and well-formed") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.length == names.length, "duplicate query names")
    names.foreach(n => assert(n.matches("q\\d+_[a-z0-9_]+"), s"bad name: $n"))
    // a QDef listed before its oracle val's declaration captures null (Scala
    // val init order) and would silently break the driver's oracle_sql.json
    Registry.all.foreach(q => q.oracle.foreach(sql =>
      assert(sql != null && sql.nonEmpty, s"${q.name} has a null/empty oracle")))
  }

  test("every oracle query declares a total ORDER BY (determinism convention 1)") {
    Registry.all.flatMap(q => q.oracle.map(q.name -> _)).foreach { case (name, sql) =>
      assert(sql.toUpperCase.contains("ORDER BY"), s"$name oracle lacks ORDER BY")
    }
  }

  test("oracle SQL references only the driver's table names") {
    val tables = Set("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
    // every FROM/JOIN target must be a known table or a CTE defined in the query
    // \b guard: without it, a column like `n_from` followed by the FROM keyword
    // matches as FROM\s+FROM and reports a phantom relation named 'from'
    val fromPat = "(?i)\\b(?:FROM|JOIN)\\s+([a-zA-Z_][a-zA-Z0-9_]*)".r
    // DuckDB built-in TABLE FUNCTIONS are valid FROM targets that are neither
    // base tables nor CTEs (q245/q250 use generate_series as a lag/dim spine)
    val tableFunctions = Set("generate_series", "range", "unnest")
    Registry.all.flatMap(q => q.oracle.map(q.name -> _)).foreach { case (name, sql) =>
      // both CTE forms: `name AS (` and the recursive `name(col, ...) AS (`
      val ctes = "(?i)([a-zA-Z_][a-zA-Z0-9_]*)\\s*(?:\\([^)]*\\))?\\s+AS\\s*\\(".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      fromPat.findAllMatchIn(sql).map(_.group(1).toLowerCase).foreach { t =>
        assert(tables.contains(t) || ctes.contains(t) || tableFunctions.contains(t),
          s"$name oracle references unknown relation '$t'")
      }
    }
  }

  test("SparkEntry exposes the registry faithfully and entry() returns rows") {
    assert(SparkEntry.queries.keySet == Registry.all.map(_.name).toSet)
    assert(SparkEntry.oracleSql.keySet subsetOf SparkEntry.queries.keySet)
    assert(SparkEntry.entry(spark).count() > 0, "driver smoke: entry must return rows")
  }
}
