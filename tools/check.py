#!/usr/bin/env python3
"""Local correctness harness mimicking the driver's DuckDB-oracle compare.

Usage:
  python3 tools/check.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out_dir>/<name>/ parquet (Spark result) and runs the matching oracle SQL
from <out_dir>/oracle_sql.json in DuckDB with views over <sf_dir>/*.parquet, then
compares: same columns (sorted by name), same row count, same values (floats to 1e-9
after both engines already ROUND to 2; exact for everything else).
"""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def pa_is_nested(t):
    import pyarrow as pa
    return (pa.types.is_list(t) or pa.types.is_large_list(t)
            or pa.types.is_fixed_size_list(t) or pa.types.is_struct(t)
            or pa.types.is_map(t))

def norm(v):
    if isinstance(v, float):
        return round(v, 6)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"MISS  {name}: no spark output")
            n_fail += 1
            continue
        if len(files) > 1:
            # Verify.scala coalesce(1)s every write; multiple parts would lose the
            # global row order the compare depends on — fail loudly, never read a part
            print(f"FAIL  {name}: {len(files)} part files (expected exactly 1)")
            n_fail += 1
            continue
        try:
            spark_tbl = pq.read_table(files[0])
        except Exception as e:
            print(f"FAIL  {name}: cannot read spark parquet: {e}")
            n_fail += 1
            continue
        # the driver's checker sorts result cells through pandas, which throws
        # `TypeError: unhashable type: 'numpy.ndarray'` on any list/struct/map
        # cell (round-10 q217 lesson — the FOURTH local-vs-driver divergence:
        # r6 column case, r7 signed zero, r8 HUGEINT, r10 arrays). Nested
        # output types can therefore NEVER get a driver verdict; fail them here
        # even though this harness could value-compare them.
        nested = [f.name for f in spark_tbl.schema
                  if pa_is_nested(f.type)]
        if nested:
            print(f"FAIL  {name}: spark output columns {nested} are list/struct/map "
                  f"-- the driver's pandas sorter crashes on nested cells; scalarize "
                  f"per the q13 convention: array_join(transform(c, x -> CAST(x AS "
                  f"STRING)), ',')")
            n_fail += 1
            continue
        try:
            duck = con.sql(oracle[name])
            dcols = duck.columns
            # the driver's value hash goes through Arrow, which renders DuckDB
            # HUGEINT (int128) as decimal128 — a Spark integer column can NEVER
            # hash-match it even when every value is identical (round-8 q204/q208
            # lesson). Spark has no int128 type, so any HUGEINT oracle column is
            # an oracle-typing bug: CAST it (usually AS BIGINT) in the SQL.
            dtypes = [str(t).upper() for t in duck.types]
            huge = [c for c, t in zip(dcols, dtypes) if "HUGEINT" in t]
            if huge:
                print(f"FAIL  {name}: oracle columns {huge} typed HUGEINT (int128) "
                      f"-- driver hash renders these decimal128; CAST(... AS BIGINT) in the oracle SQL")
                n_fail += 1
                continue
            drows = duck.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        scols = spark_tbl.column_names
        # the driver's hash is CASE-SENSITIVE on column names — compare exactly
        if sorted(scols) != sorted(dcols):
            print(f"FAIL  {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            n_fail += 1
            continue
        # driver sorts columns by name before hashing values
        order = sorted(range(len(dcols)), key=lambda i: dcols[i])
        duck_rows = [tuple(norm(r[i]) for i in order) for r in drows]
        sdict = {c: spark_tbl.column(c).to_pylist() for c in scols}
        scols_sorted = sorted(scols)
        spark_rows = list(zip(*[[norm(v) for v in sdict[c]] for c in scols_sorted])) \
            if spark_tbl.num_rows else []
        if len(spark_rows) != len(duck_rows):
            print(f"FAIL  {name}: rows spark={len(spark_rows)} duck={len(duck_rows)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(spark_rows, duck_rows)):
            ok = len(a) == len(b)
            if ok:
                for x, y in zip(a, b):
                    if isinstance(x, float) or isinstance(y, float):
                        try:
                            fx, fy = float(x), float(y)
                        except (TypeError, ValueError):
                            ok = False; break
                        if math.isnan(fx) and math.isnan(fy):
                            continue
                        if abs(fx - fy) > 1e-9:
                            ok = False; break
                        # the driver's value hash is BIT-pattern exact on the
                        # rounded floats, so -0.0 != 0.0 (round-7 q171 lesson)
                        if fx == 0.0 and fy == 0.0 and \
                                math.copysign(1.0, fx) != math.copysign(1.0, fy):
                            ok = False; break
                    elif x != y:
                        ok = False; break
            if not ok:
                bad = (i, a, b)
                break
        if bad:
            i, a, b = bad
            print(f"FAIL  {name}: row {i} spark={a} duck={b} (cols {scols_sorted})")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(spark_rows)} rows")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
