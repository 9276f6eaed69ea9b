#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: read Verify's parquet outputs,
run each oracle SQL in DuckDB over the same sf tables, compare row/schema/values
after sorting columns by name and rows by all columns."""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, np.ndarray))).any():
            df[c] = df[c].map(lambda v: str(list(v)) if isinstance(v, (list, np.ndarray)) else str(v))
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir) if os.path.isdir(f"{out_dir}/{d}"))
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        if name not in oracle:
            if len(got) == 0:
                print(f"FAIL {name}: rows-only query returned 0 rows"); n_fail += 1
            else:
                print(f"ROWS {name}: rows={len(got)}")
            continue
        try:
            rel = con.sql(oracle[name])
            # HUGEINT/UHUGEINT don't round-trip to int64 in the driver's value
            # hash (pandas maps them to float64/object) — treat as failure here
            # so it's caught before the driver does.
            bad_types = {c: str(t) for c, t in zip(rel.columns, rel.types)
                         if str(t) in ("HUGEINT", "UHUGEINT")}
            if bad_types:
                print(f"FAIL {name}: oracle emits {bad_types}; CAST the aggregate"); n_fail += 1; continue
            exp = rel.df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}"); n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); n_fail += 1; continue
        ok = True
        for c in g.columns:
            a, b = g[c].to_numpy(), e[c].to_numpy()
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                same = np.array_equal(a.astype(float), b.astype(float), equal_nan=True)
            else:
                same = (pd.Series(a).astype(str) == pd.Series(b).astype(str)).all()
            if not same:
                mism = None
                try:
                    idx = np.where(a != b)[0][:3]
                    mism = [(int(i), a[i], b[i]) for i in idx]
                except Exception:
                    pass
                print(f"FAIL {name}: column {c} differs; first mismatches {mism}")
                ok = False; break
        if ok:
            print(f"PASS {name}: rows={len(g)}"); n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {len(names)} total")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
