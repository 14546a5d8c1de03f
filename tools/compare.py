#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracles in oracle_sql.json and diff.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    results = {}
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            results[name] = "NO_SPARK_OUTPUT"
            print(f"[{name}] NO SPARK OUTPUT")
            continue
        try:
            sdf = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        except Exception as e:
            results[name] = f"SPARK_READ_FAIL {e}"
            print(f"[{name}] SPARK READ FAIL: {e}")
            continue
        try:
            odf = con.execute(sql).df()
        except Exception as e:
            results[name] = f"ORACLE_FAIL {e}"
            print(f"[{name}] ORACLE FAIL: {str(e).splitlines()[0]}")
            continue
        sdf = sdf.reindex(sorted(sdf.columns), axis=1)
        odf = odf.reindex(sorted(odf.columns), axis=1)
        ok_rows = len(sdf) == len(odf)
        ok_cols = list(sdf.columns) == list(odf.columns)
        status = []
        if not ok_rows:
            status.append(f"rows {len(sdf)} vs {len(odf)}")
        if not ok_cols:
            status.append(f"cols {list(sdf.columns)} vs {list(odf.columns)}")
        ok_vals = False
        if ok_rows and ok_cols:
            # normalize cell values to comparable strings
            def norm(df):
                out = df.copy()
                for c in out.columns:
                    out[c] = out[c].map(lambda v: _norm_cell(v))
                return out
            a, b = norm(sdf), norm(odf)
            neq = (a != b)
            ok_vals = not neq.any().any()
            if not ok_vals:
                bad_cols = [c for c in a.columns if neq[c].any()]
                n_bad = int(neq.any(axis=1).sum())
                status.append(f"{n_bad} rows differ in {bad_cols}")
                idx = neq.any(axis=1)
                ex = pd.concat([a[idx].head(3).add_suffix("_spark"),
                                b[idx].head(3).add_suffix("_duck")], axis=1)
                status.append("\n" + ex.to_string())
        verdict = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        results[name] = verdict
        print(f"[{name}] {verdict}" + ("  " + "; ".join(status) if status else ""))
    n_ok = sum(1 for v in results.values() if v == "OK")
    print(f"\n{n_ok}/{len(results)} OK")

def _norm_cell(v):
    import numpy as np, datetime
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, float):
        if v != v:
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))  # 3.0 == 3
        return repr(round(v, 9))
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, np.integer):
        return str(int(v))
    if isinstance(v, np.bool_):
        return str(bool(v))
    return str(v)

if __name__ == "__main__":
    main()
