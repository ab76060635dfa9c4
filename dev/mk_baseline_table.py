#!/usr/bin/env python3
"""Emit the BASELINE.md per-query table from bench windows + duck json.
Usage: mk_baseline_table.py duck.json med.json cold_stderr_file
(cold values parsed from the '[bench] cold_queries' stderr line)."""
import sys, json, re
duck = json.load(open(sys.argv[1]))
med = json.load(open(sys.argv[2]))
cold = {}
for line in open(sys.argv[3]):
    if 'cold_queries' in line:
        for m in re.finditer(r'(q\w+)=([0-9.]+|-1.000)', line):
            cold[m.group(1)] = float(m.group(2))
def fmt_cold(q):
    # -1 is Bench's failed-measurement sentinel; absent = not on the cold
    # line — neither is a real 0 ms measurement
    v = cold.get(q)
    return f"{v*1000:.0f}" if v is not None and v >= 0 else "—"
print("| query | duckdb med3 | spark warm med3 | spark cold | warm ratio |")
print("|---|---|---|---|---|")
ss = ds = 0.0
for q in sorted(med):
    if q not in duck:
        print(f"| {q} | — (no oracle) | {med[q]*1000:.0f} | {fmt_cold(q)} | — |")
        continue
    ss += med[q]; ds += duck[q]
    print(f"| {q} | {duck[q]*1000:.0f} | {med[q]*1000:.0f} | {fmt_cold(q)} | {med[q]/duck[q]:.1f}× |")
allsum = sum(med.values())
cold_sum = sum(v for v in cold.values() if v >= 0)
print(f"| **total ({len([q for q in med if q in duck])} oracled / {len(med)} all)** | **{ds*1000:.0f}** (oracled) | **{allsum*1000:.0f}** (all) / **{ss*1000:.0f}** (oracled) | **{cold_sum*1000:.0f}** | **{ss/ds:.2f}× (oracled subset)** |")
