#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness check.

Runs after `graft.Verify` has dumped results: for each query result parquet
and its oracle SQL, executes the SQL in DuckDB over the sf tables and
compares row sets (column-name-sorted, row-sorted, exact values).

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
"""
import json, math, sys
import duckdb

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = repr(v)  # exact double repr
            vals.append(str(v))
        out.append("\x01".join(vals))
    return sorted(out)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders","lineitem",
              "events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Verify emits each oracle under both "<name>" and "<name>.parquet"
    # (the driver looks up by result file name); dedupe to the bare name.
    oracle = {name[:-len(".parquet")] if name.endswith(".parquet") else name: sql
              for name, sql in oracle.items()}
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            ours = con.execute(f"SELECT * FROM '{out_dir}/{name}.parquet/*.parquet'")
            scols = [d[0] for d in ours.description]
            srows = ours.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        if sorted(ocols) != sorted(scols):
            print(f"FAIL {name}: cols oracle={sorted(ocols)} spark={sorted(scols)}")
            n_bad += 1
            continue
        a, b = canon(orows, ocols), canon(srows, scols)
        if a == b:
            print(f"OK   {name}: {len(a)} rows")
            n_ok += 1
        else:
            n_bad += 1
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            only_a = [x for x in a if x not in set(b)][:3]
            print(f"FAIL {name}: rows oracle={len(a)} spark={len(b)}; first diffs {diff or only_a}")
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
