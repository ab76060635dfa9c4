#!/usr/bin/env python3
"""Fold N bench-window JSON lines into the cross-window per-query median
med.json (full oracle names, seconds) the table/ratio tooling consumes.

Usage: win_median.py verify_out win1.json [win2.json ...] > med.json

Bench's JSON line keys per-query MILLISECONDS under "queries_ms" on the
qNN short prefix; oracle_sql.json maps prefixes back to full names.
No-oracle entries (q32 etc., absent from oracle_sql.json) stay keyed on
their bare prefix — the same spelling the BASELINE per-query table has
always used for them. A -1 value is Bench's failed-measurement sentinel
and is dropped from that window's sample rather than folded in.
"""
import sys, os, json, statistics

verify_out = sys.argv[1]
wins = [json.load(open(p)) for p in sys.argv[2:]]
names = set(json.load(open(os.path.join(verify_out, "oracle_sql.json"))))
by_prefix = {}
for w in wins:
    qs = w.get("queries_ms") or w.get("queries") or {}
    for q, v in qs.items():
        sec = v / 1000.0 if "queries_ms" in w else float(v)
        if sec >= 0:
            by_prefix.setdefault(q.split("_")[0], []).append(sec)
full = {p: p for p in by_prefix}
for n in names:
    full[n.split("_")[0]] = n
med = {full[p]: round(statistics.median(vs), 4)
       for p, vs in sorted(by_prefix.items())}
print(json.dumps(med))
