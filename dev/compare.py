#!/usr/bin/env python3
"""Local pre-validation of the t2 gate: run graft.Verify output against the
DuckDB oracle the same way the driver does (columns sorted by name, rows
sorted, values hashed). Usage:
    python3 dev/compare.py /tmp/verify_out /root/testdata/sf0.01 [query ...]
"""
import sys, os, json, math
import duckdb

def canon(rows):
    out = []
    for r in rows:
        cr = []
        for v in r:
            if isinstance(v, float):
                if math.isnan(v):
                    cr.append("NaN")
                else:
                    cr.append(repr(v))
            elif v is None:
                cr.append("NULL")
            else:
                cr.append(str(v))
        out.append(tuple(cr))
    out.sort()
    return out

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        pq = os.path.join(out_dir, name)
        if not os.path.isdir(pq):
            print(f"FAIL {name}: no spark output dir"); n_fail += 1; continue
        try:
            spark_df = con.execute(f"SELECT * FROM read_parquet('{pq}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: read spark output: {e}"); n_fail += 1; continue
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1; continue
        s_cols, d_cols = sorted(spark_df.columns), sorted(duck_df.columns)
        if s_cols != d_cols:
            print(f"FAIL {name}: columns {s_cols} vs {d_cols}"); n_fail += 1; continue
        s = canon(spark_df[s_cols].itertuples(index=False, name=None))
        d = canon(duck_df[d_cols].itertuples(index=False, name=None))
        if len(s) != len(d):
            print(f"FAIL {name}: rows {len(s)} vs {len(d)}"); n_fail += 1; continue
        if s != d:
            diff = [(a, b) for a, b in zip(s, d) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diff}"); n_fail += 1; continue
        print(f"PASS {name} ({len(s)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(oracle)} oracled queries")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
