#!/usr/bin/env python3
"""Self-test for tools/check.py: plant fixtures that MUST fail and MUST pass.

The round-6/7/8 pattern was "local harness weaker than the driver hash"
(column case -> signed zero -> HUGEINT). This script pins the harness itself:
it builds a tiny Verify-shaped out dir and asserts check.py goes red on the
classes the driver catches and green on the control.

Usage: python3 tools/selftest_check.py   (exit 0 = harness behaves)
"""
import json, os, subprocess, sys, tempfile
import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))
CHECK = os.path.join(HERE, "check.py")
SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.001")


def write_case(root, name, arrays, names, sql):
    d = os.path.join(root, name)
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table(arrays, names=names), os.path.join(d, "part-0.parquet"))
    return sql


def run(root, oracle):
    with open(os.path.join(root, "oracle_sql.json"), "w") as f:
        json.dump(oracle, f)
    p = subprocess.run([sys.executable, CHECK, root, SF] + sorted(oracle),
                       capture_output=True, text=True)
    return p.returncode, p.stdout + p.stderr


def main():
    failures = []
    with tempfile.TemporaryDirectory() as root:
        oracle = {}
        # 1) MUST FAIL: uncast SUM -> DuckDB HUGEINT vs Spark bigint (r8 q204/q208)
        oracle["x_hugeint"] = write_case(
            root, "x_hugeint", [pa.array([3], type=pa.int64())], ["s"],
            "SELECT SUM(x) AS s FROM (VALUES (1), (2)) t(x)")
        # 2) MUST FAIL: signed-zero mismatch (r7 q171)
        oracle["x_negzero"] = write_case(
            root, "x_negzero", [pa.array([0.0], type=pa.float64())], ["z"],
            "SELECT ROUND(CAST(-0.4 AS DOUBLE), 0) AS z")
        # 3) MUST FAIL: column-name case mismatch (r6)
        oracle["x_case"] = write_case(
            root, "x_case", [pa.array([1], type=pa.int64())], ["N"],
            "SELECT CAST(1 AS BIGINT) AS n")
        # 4) MUST PASS: the cast control
        oracle["x_green"] = write_case(
            root, "x_green", [pa.array([3], type=pa.int64())], ["s"],
            "SELECT CAST(SUM(x) AS BIGINT) AS s FROM (VALUES (1), (2)) t(x)")
        rc, out = run(root, oracle)
        if rc == 0:
            failures.append("check.py exited 0 on a suite with planted defects")
        for must_fail in ("x_hugeint", "x_negzero", "x_case"):
            if f"FAIL  {must_fail}" not in out:
                failures.append(f"planted defect {must_fail} was NOT caught")
        if "PASS  x_green" not in out:
            failures.append("green control x_green did not pass")
        if "HUGEINT" not in out:
            failures.append("HUGEINT defect not attributed to int128 typing")
    if failures:
        print("SELFTEST FAIL:")
        for f in failures:
            print("  -", f)
        sys.exit(1)
    print("SELFTEST PASS: check.py catches HUGEINT, signed zero, column case; control green")


if __name__ == "__main__":
    main()
