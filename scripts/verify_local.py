#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: after `sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"`,
run `python3 scripts/verify_local.py /root/testdata/sf0.01 /tmp/verify_out`.

For each query: load our parquet result and the DuckDB oracle result, sort
columns by name, sort rows, and compare values (exact for ints/strings,
bit-exact for floats unless --tol is raised).
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

def load_ours(outdir, name):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        return None
    con = duckdb.connect()
    return con.execute(
        "SELECT * FROM read_parquet([" +
        ",".join(f"'{f}'" for f in files) + "])").df()

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    with open(f"{outdir}/oracle_sql.json") as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_pass = n_fail = 0
    names = sorted(set(list(oracles.keys()) +
                       [os.path.basename(d) for d in glob.glob(f"{outdir}/*")
                        if os.path.isdir(d)]))
    for name in names:
        ours = load_ours(outdir, name)
        if ours is None:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        if name not in oracles:
            ok = len(ours) > 0
            print(f"{'pass' if ok else 'FAIL'} {name}: rows-only ({len(ours)} rows)")
            n_pass += ok; n_fail += (not ok); continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        a, b = canon(ours), canon(exp)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1; continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}"); n_fail += 1; continue
        bad = []
        for c in a.columns:
            x, y = a[c], b[c]
            if x.dtype.kind == 'f' or y.dtype.kind == 'f':
                xa = x.to_numpy(dtype='float64', na_value=np.nan)
                ya = y.to_numpy(dtype='float64', na_value=np.nan)
                eq = (xa == ya) | (np.isnan(xa) & np.isnan(ya))
                if not eq.all():
                    i = int(np.argmin(eq))
                    bad.append(f"{c}: row {i}: {xa[i]!r} vs {ya[i]!r}")
            else:
                xs, ys = x.astype(str), y.astype(str)
                if not (xs == ys).all():
                    i = int((xs != ys).to_numpy().argmax())
                    bad.append(f"{c}: row {i}: {x.iloc[i]!r} vs {y.iloc[i]!r}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad[:3])); n_fail += 1
        else:
            print(f"pass {name} ({len(a)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
