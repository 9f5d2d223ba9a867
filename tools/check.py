#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate (dev tool only).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [--json OUT.json]

Loads each <verifyOutDir>/<name>/ parquet (Spark result), runs the
matching oracle SQL from oracle_sql.json in DuckDB over <sfDir>'s
tables, and compares: columns sorted by name, rows sorted by all
columns, exact value equality (what a hash compare would see).

--json OUT.json additionally writes a driver-style result map
(name -> rows_match/schema_match/hash_match/spark_rows/oracle_rows/err)
so repeatable gates (graft.VerifySf1) can commit the evidence.
Exit code is 1 if any oracle-checked query fails.

--only a,b,c restricts the compare to the named queries (skips both
the dump scan and the missing-output sweep for everything else); with
--json, existing entries for OTHER queries in OUT.json are preserved
(read-modify-write merge) so an incremental re-check of a few queries
extends prior evidence instead of clobbering it.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes: ints → int64 (nullable), floats → float64
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), ignore_index=True)

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    json_out = None
    if "--json" in sys.argv:
        json_out = sys.argv[sys.argv.index("--json") + 1]
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata is one flat file per table; our ScaleUp
        # probe dirs are Spark-style part-file directories
        src = f"{sfdir}/{t}.parquet"
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracles = json.load(f)
    results = {}
    jout = {}
    def record(name, rows_match=None, schema_match=None, hash_match=None,
               spark_rows=None, oracle_rows=None, err=None):
        jout[name] = {"rows_match": rows_match, "schema_match": schema_match,
                      "hash_match": hash_match, "spark_rows": spark_rows,
                      "oracle_rows": oracle_rows, "err": err}
    for name in sorted(os.listdir(outdir)):
        path = os.path.join(outdir, name)
        if not os.path.isdir(path) or (only is not None and name not in only):
            continue
        got = con.sql(f"SELECT * FROM '{path}/*.parquet'").df()
        if name not in oracles:
            results[name] = f"ROWS_ONLY rows={len(got)}"
            record(name, spark_rows=len(got), err="no_oracle")
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_ERROR {type(e).__name__}: {e}"
            record(name, spark_rows=len(got), err=f"oracle_error: {type(e).__name__}")
            continue
        # Raw-type gate first: the driver hashes *raw* values, so a DuckDB
        # HUGEINT (count_if) or DOUBLE (ceil/floor) vs a Spark BIGINT fails
        # there even when the normalized values match. Compare pre-normalized
        # dtype families (int/float/other), ignoring width and datetime unit.
        def fam(dt):
            if pd.api.types.is_integer_dtype(dt): return "int"
            if pd.api.types.is_float_dtype(dt): return "float"
            if pd.api.types.is_datetime64_any_dtype(dt): return "datetime"
            return str(dt)
        gsorted = got.reindex(sorted(got.columns), axis=1)
        esorted = exp.reindex(sorted(exp.columns), axis=1)
        tdiff = [(c, str(gsorted[c].dtype), str(esorted[c].dtype))
                 for c in gsorted.columns if c in esorted.columns
                 and fam(gsorted[c].dtype) != fam(esorted[c].dtype)]
        if tdiff:
            results[name] = f"TYPE_MISMATCH {tdiff}"
            record(name, rows_match=len(got) == len(exp), schema_match=False,
                   hash_match=False, spark_rows=len(got), oracle_rows=len(exp))
            continue
        g, e = normalize(got), normalize(exp)
        if list(g.columns) != list(e.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(g.columns)} oracle={list(e.columns)}"
            record(name, rows_match=len(g) == len(e), schema_match=False,
                   hash_match=False, spark_rows=len(g), oracle_rows=len(e))
            continue
        if len(g) != len(e):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(g)} oracle={len(e)}"
            record(name, rows_match=False, schema_match=True, hash_match=False,
                   spark_rows=len(g), oracle_rows=len(e))
            continue
        neq = []
        for c in g.columns:
            a, b = g[c], e[c]
            if pd.api.types.is_float_dtype(a) and pd.api.types.is_float_dtype(b):
                # BIT-exact compare for FINITE values, matching the
                # driver's raw hash on the case that actually bit us:
                # -0.0 != +0.0 (a `==` compare passed q_select_dsir
                # locally for two rounds while the driver failed it).
                # Scope: NaN payloads are canonicalized to one quiet NaN
                # by design, and SQL NULL folds to NaN upstream (duckdb
                # .df() / pandas load) — so a NaN-payload or NULL-vs-NaN
                # divergence would pass here but could fail a raw-bit
                # driver hash. No oracle query produces NaN or NULL
                # floats today; if one ever does, compare null masks at
                # load time (dtype_backend='numpy_nullable') first.
                av = a.to_numpy(dtype="float64", na_value=np.nan).copy()
                bv = b.to_numpy(dtype="float64", na_value=np.nan).copy()
                av[np.isnan(av)] = np.float64("nan")
                bv[np.isnan(bv)] = np.float64("nan")
                same = pd.Series(av.view(np.uint64) == bv.view(np.uint64),
                                 index=a.index)
                signed_zero = ((av == 0.0) & (bv == 0.0)
                               & (np.signbit(av) != np.signbit(bv)))
                if signed_zero.any():
                    idx = signed_zero.nonzero()[0][:3]
                    print(f"[SIGNED-ZERO] {name}.{c}: rows {list(map(int, idx))} "
                          f"spark={[repr(av[i]) for i in idx]} "
                          f"oracle={[repr(bv[i]) for i in idx]}")
            else:
                same = (a.isna() & b.isna()) | (a.astype(object) == b.astype(object))
            if not bool(same.all()):
                bad = (~same).to_numpy().nonzero()[0][:3]
                neq.append((c, [(int(i), a.iloc[i], b.iloc[i]) for i in bad]))
        if neq:
            results[name] = f"VALUE_MISMATCH {neq}"
            record(name, rows_match=True, schema_match=True, hash_match=False,
                   spark_rows=len(g), oracle_rows=len(e))
        else:
            results[name] = f"OK rows={len(g)}"
            record(name, rows_match=True, schema_match=True, hash_match=True,
                   spark_rows=len(g), oracle_rows=len(e))
    # an oracle whose query produced no dump (the builder failed and
    # cleaned up) must fail loudly, not vanish from the report
    for name in sorted((set(oracles) if only is None else set(only) & set(oracles))
                       - set(results)):
        results[name] = "MISSING_OUTPUT query produced no parquet dump"
        record(name, rows_match=False, schema_match=False, hash_match=False,
               err="missing_output")
    npass = sum(1 for v in results.values() if v.startswith("OK"))
    nfail = 0
    for k, v in results.items():
        flag = "PASS" if v.startswith("OK") else ("INFO" if v.startswith("ROWS_ONLY") else "FAIL")
        nfail += flag == "FAIL"
        print(f"[{flag}] {k}: {v[:400]}")
    print(f"== {npass}/{len([v for v in results.values() if not v.startswith('ROWS_ONLY')])} oracle-checked queries pass")
    if json_out:
        if only is not None and os.path.exists(json_out):
            with open(json_out) as f:
                prior = json.load(f)
            prior.update(jout)
            jout = prior
        with open(json_out, "w") as f:
            json.dump(jout, f, indent=1, sort_keys=True)
        print(f"== wrote {json_out}")
    sys.exit(1 if nfail else 0)

if __name__ == "__main__":
    main()
