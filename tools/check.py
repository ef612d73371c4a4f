#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

For each <name>.parquet dir under verify_out_dir, runs oracle_sql.json[name]
in DuckDB over the sf_dir tables, then compares: row count, column names,
and a hash of the value matrix with columns sorted by name and rows sorted.
"""
import sys, json, glob, os, hashlib
import duckdb
import pandas as pd

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize integer-valued floats (duckdb HUGEINT->float64 etc. should
    # be fixed in the SQL, but keep comparison value-based)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def cell(v):
    if isinstance(v, float):
        if v != v:
            return "nan"
        if v == int(v) and abs(v) < 2**53:
            return str(int(v))
        return f"{v:.10g}"
    # normalize date vs midnight-datetime representations across engines
    s = str(v)
    return s[:-9] if s.endswith(" 00:00:00") else s

def h(df: pd.DataFrame) -> str:
    m = hashlib.md5()
    for row in df.itertuples(index=False):
        m.update(("|".join(cell(v) for v in row) + "\n").encode())
    return m.hexdigest()

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_bad = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        spark_df = pd.concat([pd.read_parquet(f) for f in files]) if files \
            else pd.DataFrame()
        if name not in oracle:
            print(f"{name}: NO_ORACLE rows={len(spark_df)}")
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"{name}: ORACLE_ERR {e}")
            n_bad += 1
            continue
        a, b = norm(spark_df), norm(duck_df)
        rows_ok = len(a) == len(b)
        cols_ok = list(a.columns) == list(b.columns)
        hash_ok = rows_ok and cols_ok and h(a) == h(b)
        status = "OK" if hash_ok else "MISMATCH"
        if not hash_ok:
            n_bad += 1
            print(f"{name}: {status} rows={len(a)}/{len(b)} cols_ok={cols_ok}")
            if rows_ok and cols_ok:
                diff = (a.astype(str) != b.astype(str)).any(axis=1)
                print("  first diffs:")
                print(a[diff].head(3).to_string())
                print(b[diff].head(3).to_string())
        else:
            print(f"{name}: OK rows={len(a)}")
    print(f"\n{'ALL GREEN' if n_bad == 0 else f'{n_bad} FAILURES'}")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
