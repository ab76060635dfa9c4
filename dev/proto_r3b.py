#!/usr/bin/env python3
"""Prototype/validate the round-3b oracle SQLs in DuckDB before wiring them
into the catalog (dev/STATE.md workflow)."""
import duckdb, sys

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

Q45 = """
WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS token FROM documents),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
n AS (SELECT count(*) AS n FROM documents),
sc AS (SELECT doc_id, token, round(tf * ln(n.n * 1.0 / df), 4) AS score
       FROM tf JOIN df USING (token) CROSS JOIN n),
rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rnk
       FROM sc)
SELECT doc_id, CAST(rnk AS INT) AS rnk, token, score
FROM rk WHERE rnk <= 3 ORDER BY doc_id, rnk
"""

Q46 = """
WITH e AS (SELECT user_id, event_type, date_trunc('microseconds', ts) AS ts FROM events),
s AS (SELECT user_id, min(ts) AS t1 FROM e WHERE event_type = 'signup' GROUP BY 1),
c AS (SELECT e.user_id, min(e.ts) AS t2 FROM e JOIN s USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s.t1 GROUP BY 1),
p AS (SELECT e.user_id, min(e.ts) AS t3 FROM e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1)
SELECT stage, depth, n FROM (
  SELECT 'signup' AS stage, 1 AS depth, count(*) AS n FROM s
  UNION ALL SELECT 'click', 2, count(*) FROM c
  UNION ALL SELECT 'purchase', 3, count(*) FROM p)
ORDER BY depth
"""

Q47 = """
WITH u AS (
  SELECT 'l_quantity' AS col, l_quantity AS v FROM lineitem
  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
SELECT col, count(*) AS n, count(*) - count(v) AS n_null,
       round(min(v), 2) AS min_v, round(max(v), 2) AS max_v,
       round(CAST(avg(CAST(v AS DECIMAL(18,2))) AS DOUBLE), 2) AS avg_v,
       round(stddev_samp(v), 2) AS std_v
FROM u GROUP BY col ORDER BY col
"""

Q48 = """
WITH c AS (SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS v FROM customer),
b AS (SELECT min(v) AS lo, max(v) AS hi FROM c)
SELECT CAST((v - lo) * 10 / (hi - lo + 1) AS INT) AS bucket,
       count(*) AS n,
       round(min(v) / 100.0, 2) AS lo_v, round(max(v) / 100.0, 2) AS hi_v
FROM c CROSS JOIN b GROUP BY 1 ORDER BY 1
"""

Q49 = """
WITH tok AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
ix AS (SELECT doc_id, unnest(toks) AS t, generate_subscripts(toks, 1) AS i FROM tok),
bi AS (SELECT a.t AS w1, b.t AS w2 FROM ix a JOIN ix b
       ON a.doc_id = b.doc_id AND b.i = a.i + 1),
bc AS (SELECT w1, w2, count(*) AS c_xy FROM bi GROUP BY 1, 2),
uc AS (SELECT t AS w, count(*) AS c_w FROM ix GROUP BY 1),
tot AS (SELECT (SELECT count(*) FROM bi) AS t_bi, (SELECT count(*) FROM ix) AS t_u)
SELECT w1, w2, CAST(c_xy AS BIGINT) AS c_xy,
       round(ln((c_xy * 1.0 / t_bi) / ((u1.c_w * 1.0 / t_u) * (u2.c_w * 1.0 / t_u))), 4) AS pmi
FROM bc JOIN uc u1 ON bc.w1 = u1.w JOIN uc u2 ON bc.w2 = u2.w CROSS JOIN tot
WHERE c_xy >= 5
ORDER BY pmi DESC, w1, w2 LIMIT 20
"""

for name, q in [("q45_tfidf", Q45), ("q46_funnel", Q46), ("q47_profile", Q47),
                ("q48_histogram", Q48), ("q49_pmi_bigrams", Q49)]:
    df = con.execute(q).fetchdf()
    print(f"=== {name}: {len(df)} rows")
    print(df.head(8).to_string())
