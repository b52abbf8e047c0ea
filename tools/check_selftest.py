#!/usr/bin/env python3
"""Self-test for tools/check.py's harness-divergence guards.

The driver's checker sorts result cells through pandas, which CANNOT handle
nested (list/struct/map) cells — it crashes with `unhashable type:
'numpy.ndarray'` and the query gets NO verdict (round-10 q217). check.py must
therefore FAIL any query whose Spark output parquet carries a nested column,
even though check.py itself could value-compare it. This test plants exactly
that fixture and asserts check.py rejects it with the scalarization hint.

Usage: python3 tools/check_selftest.py   (exit 0 = guard works)
"""
import json, os, subprocess, sys, tempfile

import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))


def run_check(out_dir, sf_dir, *names):
    return subprocess.run(
        [sys.executable, os.path.join(HERE, "check.py"), out_dir, sf_dir, *names],
        capture_output=True, text=True)


def main():
    with tempfile.TemporaryDirectory() as tmp:
        sf_dir = os.path.join(tmp, "sf")
        os.makedirs(sf_dir)
        # minimal table views for check.py's CREATE VIEW preamble
        for t in ["region", "nation", "customer", "supplier", "part", "orders",
                  "lineitem", "events", "documents", "embeddings"]:
            pq.write_table(pa.table({"x": [1]}), os.path.join(sf_dir, f"{t}.parquet"))

        out_dir = os.path.join(tmp, "out")
        qdir = os.path.join(out_dir, "q999_raw_array")
        os.makedirs(qdir)
        # the poison fixture: a raw LIST column, exactly q217's round-10 shape
        pq.write_table(
            pa.table({"k": [1, 2], "arr": [[1, 2], [3]]}),
            os.path.join(qdir, "part-0.parquet"))
        with open(os.path.join(out_dir, "oracle_sql.json"), "w") as f:
            json.dump({"q999_raw_array": "SELECT 1 AS k, [1,2] AS arr"}, f)

        r = run_check(out_dir, sf_dir, "q999_raw_array")
        ok = (r.returncode != 0 and "arr" in r.stdout
              and "scalarize" in r.stdout and "q13" in r.stdout)
        if not ok:
            print("SELFTEST FAIL: nested-column fixture was not rejected")
            print(r.stdout)
            print(r.stderr)
            sys.exit(1)

        # control: the same shape with the array scalarized must PASS
        qdir2 = os.path.join(out_dir, "q998_scalarized")
        os.makedirs(qdir2)
        pq.write_table(
            pa.table({"arr": ["1,2", "3"], "k": [1, 2]}),
            os.path.join(qdir2, "part-0.parquet"))
        with open(os.path.join(out_dir, "oracle_sql.json"), "w") as f:
            json.dump({"q998_scalarized":
                       "SELECT * FROM (VALUES (1, '1,2'), (2, '3')) t(k, arr)"}, f)
        r2 = run_check(out_dir, sf_dir, "q998_scalarized")
        if r2.returncode != 0:
            print("SELFTEST FAIL: scalarized control did not pass")
            print(r2.stdout)
            print(r2.stderr)
            sys.exit(1)

        print("SELFTEST PASS: nested outputs rejected, scalarized control green")


if __name__ == "__main__":
    main()
