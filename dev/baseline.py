#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB — the de-facto performance baseline
(BASELINE.md). Usage:
    python3 dev/baseline.py /tmp/verify_out /root/testdata/sf0.1 [reps]
Writes one JSON line: {"query": sec, ...} (median of reps, default 3).

Bar-adjacent stabilization (r16, VERDICT r15 #5): the >2x weak-set rule
only applies to rows whose DuckDB median is >= 100 ms, and DuckDB medians
drift +-15% between sessions — so rows hovering near the bar (q94/q82 in
r15) flap in and out on denominator noise alone. Any query whose first-
pass median lands within +-30% of the 100 ms bar (70-130 ms) is re-timed
with a 5-run median, and that median is the published number. The wider
sample doesn't remove the volatility; it shrinks the flap window enough
that classification reflects the query, not the session. A row whose
median sits ABOVE the band but whose fastest rep is below the band top
is re-timed too (the "carried" case, measured in r16: a below-bar row
read 150 ms adjacent to a bench window because every first-pass rep
was contended, 74 ms quiet — the min is the rep least contaminated).
"""
import sys, os, json, time, statistics
import duckdb

BAR = 0.100          # the weak-set denominator bar (seconds)
BAR_BAND = 0.30      # +-30%: the hover zone that gets the 5-run median
STABLE_REPS = 5

def timed(con, sql, reps):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        try:
            con.execute(sql).fetchall()
        except Exception:
            return [-1.0]
        ts.append(time.perf_counter() - t0)
    return ts

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    times = {}
    restated = []
    for name in sorted(oracle):
        ts = timed(con, oracle[name], reps)
        med = statistics.median(ts)
        # re-time when the median hovers in the band — OR when it sits
        # ABOVE the band but the fastest rep is below the band top: a
        # contended first pass can carry a genuinely-below-bar row past
        # the band entirely (measured in r16: q74 read 150 ms adjacent
        # to a bench window, 74 ms quiet), and the min is the rep least
        # contaminated by contention
        hover = abs(med - BAR) <= BAR * BAR_BAND
        carried = med > BAR * (1 + BAR_BAND) and min(ts) < BAR * (1 + BAR_BAND)
        if med > 0 and (hover or carried) and reps < STABLE_REPS:
            ts2 = timed(con, oracle[name], STABLE_REPS)
            med2 = statistics.median(ts2)
            # a flaky re-time rep (transient duckdb error) must not
            # overwrite an already-successful first pass with the -1
            # failure sentinel (review r16)
            if med2 > 0:
                med = med2
                restated.append(name)
        times[name] = round(med, 4)
    times["_total"] = round(sum(v for v in times.values() if v > 0), 4)
    if restated:
        print("[baseline] bar-adjacent/carried 5-run medians: "
              + ", ".join(restated), file=sys.stderr)
    print(json.dumps(times))

if __name__ == "__main__":
    main()
