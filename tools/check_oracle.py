#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

For each query dir under verify_out_dir: read our parquet result, run the
oracle SQL from oracle_sql.json in DuckDB against the sf_dir parquet tables,
sort columns by name, compare row count, column names, and a row-wise value
hash (floats rounded to 9 significant digits to absorb 1-ulp noise).
"""
import sys, json, glob, os, math
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df

def cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Integer-valued floats keep their ".0" so an int64-vs-float64 dtype
        # drift (e.g. DuckDB HUGEINT -> pandas float64) FAILS here like it
        # does in the driver; %.9g used to mask exactly that (round-2 q47).
        if math.isfinite(v) and abs(v) < 1e15 and v == int(v):
            return f"{v:.1f}"
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list,)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(cell(x) for x in v) + "]"
    return str(v)

def frame_hash(df: pd.DataFrame):
    rows = [ "\x01".join(cell(v) for v in row) for row in df.itertuples(index=False, name=None) ]
    import hashlib
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode()); h.update(b"\n")
    return h.hexdigest(), rows

def main(outdir, sfdir):
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    results = {}
    only = sys.argv[3:] or None
    for name in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, name)
        if not os.path.isdir(d):
            continue
        if only and name not in only:
            continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        mine = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            results[name] = {"status": "no-oracle", "rows": len(mine)}
            continue
        try:
            ref = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = {"status": "oracle-error", "err": str(e)[:300]}
            continue
        mine_n, ref_n = norm(mine), norm(ref)
        status = {"rows": [len(mine_n), len(ref_n)],
                  "cols": [list(mine_n.columns), list(ref_n.columns)]}
        if list(mine_n.columns) != list(ref_n.columns):
            status["status"] = "col-mismatch"
        elif len(mine_n) != len(ref_n):
            status["status"] = "row-mismatch"
        else:
            h1, r1 = frame_hash(mine_n)
            h2, r2 = frame_hash(ref_n)
            if h1 == h2:
                status["status"] = "PASS"
            else:
                status["status"] = "hash-mismatch"
                diffs = [(i, a, b) for i, (a, b) in enumerate(zip(r1, r2)) if a != b][:3]
                status["first_diffs"] = [{"row": i, "mine": a[:200], "oracle": b[:200]} for i, a, b in diffs]
        results[name] = status
    npass = sum(1 for v in results.values() if v.get("status") == "PASS")
    print(json.dumps(results, indent=1, default=str))
    print(f"\n{npass}/{len(results)} PASS")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
