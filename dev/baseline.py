#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB — the de-facto performance baseline
(BASELINE.md). Usage:
    python3 dev/baseline.py /tmp/verify_out /root/testdata/sf0.1 [reps]
Writes one JSON line: {"query": sec, ...} (median of reps, default 3).
"""
import sys, os, json, time, statistics
import duckdb

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    times = {}
    for name in sorted(oracle):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            try:
                con.execute(oracle[name]).fetchall()
            except Exception as e:
                ts = [-1.0]; break
            ts.append(time.perf_counter() - t0)
        times[name] = round(statistics.median(ts), 4)
    times["_total"] = round(sum(v for v in times.values() if v > 0), 4)
    print(json.dumps(times))

if __name__ == "__main__":
    main()
