#!/usr/bin/env python3
"""Planted-fixture test for tools/check.py's bit-exact float compare.

Plants a Spark-style dump whose float column holds -0.0 against an
oracle emitting +0.0 (the exact q_select_dsir doc-327 shape that passed
two rounds of `==`-based local checks while the driver's raw-bit hash
failed), and asserts check.py now FAILS it; then asserts the +0.0/+0.0
control PASSES, and that a NaN==NaN pair still passes (canonicalized).

Usage: python3 tools/test_check_signed_zero.py   (exit 0 = gate works)
"""
import json, os, subprocess, sys, tempfile
import duckdb

HERE = os.path.dirname(os.path.abspath(__file__))
CHECK = os.path.join(HERE, "check.py")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_case(tag, spark_sql, oracle_sql, expect_pass):
    with tempfile.TemporaryDirectory() as tmp:
        sfdir = os.path.join(tmp, "sf")
        outdir = os.path.join(tmp, "out")
        os.makedirs(sfdir)
        os.makedirs(os.path.join(outdir, "q_planted"))
        con = duckdb.connect()
        for t in TABLES:  # check.py mounts every table; give it stubs
            con.sql(f"COPY (SELECT 1 AS one) TO '{sfdir}/{t}.parquet'")
        con.sql(f"COPY ({spark_sql}) TO "
                f"'{outdir}/q_planted/part-0.parquet' (FORMAT PARQUET)")
        with open(os.path.join(outdir, "oracle_sql.json"), "w") as f:
            json.dump({"q_planted": oracle_sql}, f)
        r = subprocess.run([sys.executable, CHECK, sfdir, outdir],
                           capture_output=True, text=True)
        passed = r.returncode == 0
        ok = passed == expect_pass
        print(f"[{'OK' if ok else 'BROKEN'}] {tag}: exit={r.returncode} "
              f"(expected {'pass' if expect_pass else 'FAIL'})")
        if not ok:
            print(r.stdout)
            sys.exit(1)
        return r.stdout


out = run_case(
    "planted -0.0 vs +0.0 must FAIL",
    # the bare literal -0.0 is DECIMAL in DuckDB and loses the sign on
    # cast; CAST('-0.0' AS DOUBLE) is a true IEEE negative zero
    "SELECT 1 AS id, CAST('-0.0' AS DOUBLE) AS score",
    "SELECT 1 AS id, CAST(0.0 AS DOUBLE) AS score",
    expect_pass=False)
assert "SIGNED-ZERO" in out, "signed-zero diff was not printed explicitly"
run_case(
    "+0.0 vs +0.0 control must pass",
    "SELECT 1 AS id, 0.0 AS score", "SELECT 1 AS id, 0.0 AS score",
    expect_pass=True)
run_case(
    "NaN vs NaN canonicalized must pass",
    "SELECT 1 AS id, CAST('nan' AS DOUBLE) AS score",
    "SELECT 1 AS id, CAST('nan' AS DOUBLE) AS score",
    expect_pass=True)
print("check.py signed-zero gate: all planted cases behave correctly")
