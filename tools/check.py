#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool, driver-side
python only — NOT part of the engine).

Usage: python3 tools/check.py <sfdir> <verify_outdir>
Reads <verify_outdir>/<query>/ parquet (Spark side) and runs
<verify_outdir>/oracle_sql.json in DuckDB over the sfdir tables, compares.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df


def cmp_frames(name, sp: pd.DataFrame, du: pd.DataFrame):
    problems = []
    sp, du = norm(sp), norm(du)
    if list(sp.columns) != list(du.columns):
        return [f"columns differ: spark={list(sp.columns)} duck={list(du.columns)}"]
    if len(sp) != len(du):
        return [f"row count differs: spark={len(sp)} duck={len(du)}"]
    for c in sp.columns:
        a, b = sp[c], du[c]
        # normalize timestamps: coerce to naive UTC ns
        if "datetime" in str(a.dtype) or "datetime" in str(b.dtype):
            def naive(s):
                s = pd.to_datetime(s)
                if getattr(s.dt, "tz", None) is not None:
                    s = s.dt.tz_convert("UTC").dt.tz_localize(None)
                return s.astype("datetime64[ns]")
            a, b = naive(a), naive(b)
            if not a.equals(b):
                neq = (a != b) & ~(a.isna() & b.isna())
                n = int(neq.sum())
                if n:
                    i = neq[neq].index[0]
                    problems.append(f"col {c}: {n} ts mismatches, first at row {i}: {a[i]} vs {b[i]}")
            continue
        if str(a.dtype) != str(b.dtype):
            problems.append(f"col {c}: dtype spark={a.dtype} duck={b.dtype}")
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            af = a.astype(float)
            bf = b.astype(float)
            both_nan = af.isna() & bf.isna()
            eq = (af == bf) | both_nan
            if not eq.all():
                diff = (af - bf).abs().max()
                problems.append(f"col {c}: {(~eq).sum()} float mismatches, max abs diff {diff}")
        else:
            ao = a.astype(object).where(~a.isna(), None)
            bo = b.astype(object).where(~b.isna(), None)
            neq = [i for i, (x, y) in enumerate(zip(ao, bo)) if x != y and not (x is None and y is None)]
            if neq:
                i = neq[0]
                problems.append(f"col {c}: {len(neq)} mismatches, first at row {i}: {ao[i]!r} vs {bo[i]!r}")
    return problems


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    import os
    for t in TABLES:
        # driver testdata is a single parquet FILE per table; Spark-written
        # fixtures (MakeBenchData) are DIRECTORIES of part files
        path = f"{sfdir}/{t}.parquet"
        pat = path if os.path.isfile(path) else f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{pat}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    # optional 3rd arg: comma-list of query names OR name ranges "a..b"
    # (inclusive, sorted-order) — dev use, mirrors Verify's filter
    if len(sys.argv) > 3:
        sel = set()
        for tok in sys.argv[3].split(","):
            if ".." in tok:
                lo, hi = tok.split("..")
                sel |= {n for n in oracle if lo <= n <= hi}
            else:
                sel.add(tok)
        oracle = {k: v for k, v in oracle.items() if k in sel}
    npass = nfail = 0
    import glob
    for name, sql in sorted(oracle.items()):
        try:
            files = glob.glob(f"{outdir}/{name}/*.parquet")
            if not files:
                print(f"FAIL {name}: no spark output")
                nfail += 1
                continue
            sp = pd.read_parquet(f"{outdir}/{name}")
            du = con.sql(sql).df()
            problems = cmp_frames(name, sp, du)
            if problems:
                print(f"FAIL {name}:")
                for p in problems:
                    print(f"     {p}")
                nfail += 1
            else:
                print(f"PASS {name} ({len(sp)} rows)")
                npass += 1
        except Exception as e:
            print(f"FAIL {name}: exception {type(e).__name__}: {e}")
            nfail += 1
    # rows-only queries (no oracle)
    import os
    declared = [d for d in os.listdir(outdir) if os.path.isdir(f"{outdir}/{d}")]
    for name in sorted(set(declared) - set(oracle)):
        try:
            sp = pd.read_parquet(f"{outdir}/{name}")
            print(f"ROWS {name}: {len(sp)} rows (no oracle)")
        except Exception as e:
            print(f"FAIL {name}: unreadable output: {e}")
            nfail += 1
    print(f"== {npass} pass, {nfail} fail")
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()
