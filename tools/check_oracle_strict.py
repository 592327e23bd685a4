#!/usr/bin/env python3
"""Driver-mimicking oracle check: oracle via duckdb .df() (pandas), Spark
result via pandas.read_parquet (pyarrow). Canonicalizes like the driver
plausibly does (sort columns by name, stringify values, sort rows, hash).
Catches representation-level mismatches (HUGEINT->float64, tz-adjusted or
out-of-ns-range timestamps) that a duckdb-vs-duckdb compare hides.

Usage: python3 tools/check_oracle_strict.py <sfDir> <outDir>
"""
import glob, json, sys
import duckdb
import pandas as pd


def canon(df: pd.DataFrame):
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False, name=None):
        rows.append("\x01".join(repr(v) if isinstance(v, float) else str(v) for v in tup))
    return sorted(rows)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    oracle = {n[:-len(".parquet")] if n.endswith(".parquet") else n: s
              for n, s in oracle.items()}
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            odf = con.execute(sql).df()
            files = sorted(glob.glob(f"{out_dir}/{name}.parquet/*.parquet"))
            sdf = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        if sorted(odf.columns) != sorted(sdf.columns):
            print(f"FAIL {name}: cols oracle={sorted(odf.columns)} spark={sorted(sdf.columns)}")
            n_bad += 1
            continue
        a, b = canon(odf), canon(sdf)
        if a == b:
            print(f"OK   {name}: {len(a)} rows")
            n_ok += 1
        else:
            n_bad += 1
            diff = [(x, y) for x, y in zip(a, b) if x != y][:2]
            print(f"FAIL {name}: oracle={len(a)} spark={len(b)}; first diffs {diff}")
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
