package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.TextOps

/** Corpus/behavioral analytics catalog (SURVEY §2.4 round-3 additions):
  * search-relevance scoring, funnel analysis, dataset profiling,
  * distribution histograms and collocation mining. Each query states its
  * 100 TB scale shape in the doc; every entry is DuckDB-oracled.
  */
object Analytics {

  /** q61's anchor-codebook entry — the [[graft.functions.expressions.NativeExprs.bestAnchor]]
    * kernel's input struct shape (field names are the kernel's contract).
    */
  case class Anchor(anchor_id: Long, av: Seq[Float], an: Double)

  val qs: Seq[Q] = Seq(

    Q("q45_tfidf",
      """Q45 — TF-IDF top-3 terms per document: the S19 "index for search"
        |capability given a real relevance score. Scale shape: the RAW
        |token stream never shuffles — per-doc term frequencies are
        |computed in one pass inside the scan projection (a doc's tokens
        |live in its own row), so only the already-reduced (doc, token,
        |tf) pairs move; document frequencies attach via count(*) over
        |(partition by token) — round 7, DevQ45: the prior df
        |aggregate+join evaluated the tokenCounts scan TWICE (df branch +
        |score probe), and the window rides the same token exchange the
        |join would shuffle anyway, so the corpus is read once (a hot
        |stopword's window group occupies one partition exactly as it
        |would the join's probe partition — same bound, spillable); a
        |web-scale vocabulary is heavy-tailed (typos/URLs/numbers), so
        |nothing vocabulary-sized is ever broadcast — the corpus-size
        |scalar rides a 1-row broadcast; final top-3
        |is a per-doc window. Ranking happens on the ROUNDED score with a token
        |tie-break, so the cut is identical across engines.""".stripMargin,
      """WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |sc AS (SELECT doc_id, token, round(tf * ln(n.n * 1.0 / df), 4) AS score
        |       FROM tf JOIN df USING (token) CROSS JOIN n),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |                                    ORDER BY score DESC, token) AS rnk
        |       FROM sc)
        |SELECT doc_id, CAST(rnk AS INT) AS rnk, token, score
        |FROM rk WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      // narrow tf: one-pass per-doc token counting (multiset-identical to
      // explode + groupBy(doc_id, token).count, NativeExprsSpec) — the
      // widest shuffle of the composed form never happens
      val tf = docs.select(col("doc_id"),
          explode(graft.functions.expressions.NativeExprs
            .tokenCounts(col("text"))).as("tc"))
        .select(col("doc_id"), col("tc.token").as("token"),
                col("tc.tf").cast(LongType).as("tf"))
      // document frequency falls out of tf (one row per (doc, token)) via a
      // token-partitioned window — the tf scan is evaluated once, not per
      // branch of a df aggregate + join
      val n = docs.agg(count(lit(1)).as("n"))
      val sc = tf
        .withColumn("df", count(lit(1))
          .over(org.apache.spark.sql.expressions.Window.partitionBy("token")))
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("token"),
          round(col("tf") * log(col("n") * lit(1.0) / col("df")), 4).as("score"))
      // top-3 cut via the bounded-buffer aggregate (row-identical to
      // row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token),
      // TopKSpec): the map side ships ≤3 rows per (mapper, doc) instead of
      // window-sorting every scored row
      graft.operators.TopK.perGroup(sc, Seq("doc_id"), "score", "token", 3)
        .select(col("doc_id"), col("rnk"), col("token"), col("score"))
        .orderBy("doc_id", "rnk")
    },

    Q("q46_funnel",
      """Q46 — behavioral funnel over the event stream: users who signed
        |up, then clicked within 24 h of first signup, then purchased
        |within 24 h of that first click (each stage strictly later than
        |the previous stage's anchor). Scale shape: three stage-anchored
        |min-aggregations, each keyed on user_id with MAP-SIDE partial
        |min — per-user state is ONE timestamp per stage, never an event
        |array, so a pathological user with millions of events costs the
        |same as any other (the collect_list form this replaced carried a
        |bounded-per-user assumption; PlanShapeSpec now asserts no
        |unbounded per-key collection survives in the plan). The three
        |user_id exchanges are same-keyed, so the anchor joins reuse the
        |aggregation partitioning; the final 3-row funnel is a keyless
        |reduce per stage. Output is the 3-row stage × count funnel.""".stripMargin,
      """WITH e AS (SELECT user_id, event_type, date_trunc('microseconds', ts) AS ts
        |           FROM events),
        |s AS (SELECT user_id, min(ts) AS t1 FROM e
        |      WHERE event_type = 'signup' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM e JOIN s USING (user_id)
        |      WHERE e.event_type = 'click' AND e.ts > s.t1
        |        AND e.ts <= s.t1 + INTERVAL 24 HOUR GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM e JOIN c USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t2
        |        AND e.ts <= c.t2 + INTERVAL 24 HOUR GROUP BY 1)
        |SELECT stage, depth, n FROM (
        |  SELECT 'signup' AS stage, 1 AS depth, count(*) AS n FROM s
        |  UNION ALL SELECT 'click', 2, count(*) FROM c
        |  UNION ALL SELECT 'purchase', 3, count(*) FROM p)
        |ORDER BY depth""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
        .filter(col("event_type").isin("signup", "click", "purchase"))
        .select("user_id", "event_type", "ts")
      val day = expr("INTERVAL 24 HOURS")
      // stage 1: first signup per user — min() partial-aggregates map-side,
      // so each mapper ships one row per user it saw
      val s1 = e.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("ts")).as("t1"))
      // stage 2: first click strictly inside (t1, t1+24h]. The join keys
      // and the following groupBy share the user_id partitioning, so the
      // anchor filter + min is a narrow continuation of the join stage.
      val c1 = e.filter(col("event_type") === "click")
        .join(s1, Seq("user_id"))
        .filter(col("ts") > col("t1") && col("ts") <= col("t1") + day)
        .groupBy("user_id").agg(min(col("ts")).as("t2"))
      // stage 3: first purchase strictly inside (t2, t2+24h]
      val p1 = e.filter(col("event_type") === "purchase")
        .join(c1, Seq("user_id"))
        .filter(col("ts") > col("t2") && col("ts") <= col("t2") + day)
        .groupBy("user_id").agg(min(col("ts")).as("t3"))
      def stage(df: org.apache.spark.sql.DataFrame, name: String, depth: Int) =
        df.agg(count(lit(1)).as("n"))
          .select(lit(name).as("stage"), lit(depth).as("depth"), col("n"))
      stage(s1, "signup", 1)
        .union(stage(c1, "click", 2))
        .union(stage(p1, "purchase", 3))
        .transform(Relational.smallSort(_, "depth"))
    },

    Q("q47_profile",
      """Q47 — dataset profiling: per-column count / null-count / min /
        |max / mean / sample-stddev over lineitem's numeric columns, the
        |schema-quality pass a pipeline runs before training on new data.
        |Scale shape: ONE keyless aggregation pass computes all 4×6 stats
        |(no row expansion, no keyed shuffle — the oracle's UNION ALL /
        |an unpivot would scan-and-shuffle 4× the rows); the 1-row result
        |reshapes to the 4-row profile with a narrow explode. Mean runs on
        |DECIMAL(18,2) (§7.3); stddev is rounded to 2 dp, which absorbs
        |double partial-agg ordering differences.""".stripMargin,
      """WITH u AS (
        |  SELECT 'l_quantity' AS col_name, l_quantity AS v FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
        |SELECT col_name, count(*) AS n, count(*) - count(v) AS n_null,
        |       round(min(v), 2) AS min_v, round(max(v), 2) AS max_v,
        |       round(CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE) / count(v), 2) AS avg_v,
        |       round(stddev_samp(v), 2) AS std_v
        |FROM u GROUP BY col_name ORDER BY col_name""".stripMargin) { (s, d) =>
      // mean via the exact long-cents kernel (§7.3): value-identical to a
      // DECIMAL(18,2) sum while |Σ| < 2^53 cents, but the accumulation is
      // primitive long arithmetic instead of per-row BigDecimal (the same
      // measured ~2× that motivated Relational.cents on the money queries)
      def stats(c: String) = struct(
        lit(c).as("col_name"),
        count(lit(1)).as("n"),
        (count(lit(1)) - count(col(c))).as("n_null"),
        round(min(col(c)), 2).as("min_v"),
        round(max(col(c)), 2).as("max_v"),
        round(sum(graft.functions.expressions.NativeExprs.doubleCents(col(c)))
                .cast(DoubleType) / 100.0 / count(col(c)), 2)
          .as("avg_v"),
        round(stddev_samp(col(c)), 2).as("std_v"))
      Tables.lineitem(s, d)
        .agg(stats("l_discount").as("s1"), stats("l_extendedprice").as("s2"),
             stats("l_quantity").as("s3"), stats("l_tax").as("s4"))
        .select(explode(array(col("s1"), col("s2"), col("s3"), col("s4")))
          .as("s"))
        .select(col("s.col_name").as("col_name"), col("s.n").as("n"),
                col("s.n_null").as("n_null"), col("s.min_v").as("min_v"),
                col("s.max_v").as("max_v"), col("s.avg_v").as("avg_v"),
                col("s.std_v").as("std_v"))
        .transform(Relational.smallSort(_, "col_name"))
    },

    Q("q48_histogram",
      """Q48 — deterministic equal-width histogram of customer balances:
        |values are converted to exact integer cents (§7.3 HALF_UP), the
        |[min, max] range splits into 10 buckets with INTEGER arithmetic
        |(`div`, never float division — a float boundary can bucket
        |identical values differently across engines). Scale shape: the
        |min/max pass is a 1-row broadcast; bucketing is a narrow map; the
        |final agg has 10 groups.""".stripMargin,
      """WITH c AS (SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS v FROM customer),
        |b AS (SELECT min(v) AS lo, max(v) AS hi FROM c)
        |SELECT CAST((v - lo) * 10 // (hi - lo + 1) AS INT) AS bucket,
        |       count(*) AS n,
        |       round(min(v) / 100.0, 2) AS lo_v,
        |       round(max(v) / 100.0, 2) AS hi_v
        |FROM c CROSS JOIN b GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
        .select(round(col("c_acctbal") * 100).cast(LongType).as("v"))
      val b = c.agg(min("v").as("lo"), max("v").as("hi"))
      c.crossJoin(broadcast(b))
        .select(expr("(v - lo) * 10 div (hi - lo + 1)").cast(IntegerType)
                  .as("bucket"),
                col("v"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
             round(min(col("v")) / 100.0, 2).as("lo_v"),
             round(max(col("v")) / 100.0, 2).as("hi_v"))
        .transform(Relational.smallSort(_, "bucket"))
    },

    Q("q49_pmi_bigrams",
      """Q49 — collocation mining: top-20 bigrams by pointwise mutual
        |information (min support 5), the phrase-mining signal used to
        |build tokenizer merge tables and stop-phrase lists. Scale shape:
        |bigram extraction is NARROW (each token array zipped with its own
        |tail — no positional self-join, unlike the oracle's formulation);
        |bigram and unigram counts are keyed shuffles; the two totals ride
        |a 1-row broadcast; vocabulary-keyed count joins broadcast when
        |small. PMI is ranked on the rounded value with a (w1, w2)
        |tie-break, so the top-20 cut is engine-stable.""".stripMargin,
      """WITH tok AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
        |ix AS (SELECT doc_id, unnest(toks) AS t, generate_subscripts(toks, 1) AS i
        |       FROM tok),
        |bi AS (SELECT a.t AS w1, b.t AS w2 FROM ix a JOIN ix b
        |       ON a.doc_id = b.doc_id AND b.i = a.i + 1),
        |bc AS (SELECT w1, w2, count(*) AS c_xy FROM bi GROUP BY 1, 2),
        |uc AS (SELECT t AS w, count(*) AS c_w FROM ix GROUP BY 1),
        |tot AS (SELECT (SELECT count(*) FROM bi) AS t_bi,
        |               (SELECT count(*) FROM ix) AS t_u)
        |SELECT w1, w2, CAST(c_xy AS BIGINT) AS c_xy,
        |       round(ln((c_xy * 1.0 / t_bi) /
        |                ((u1.c_w * 1.0 / t_u) * (u2.c_w * 1.0 / t_u))), 4) AS pmi
        |FROM bc JOIN uc u1 ON bc.w1 = u1.w JOIN uc u2 ON bc.w2 = u2.w CROSS JOIN tot
        |WHERE c_xy >= 5
        |ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin) { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      // narrow bigram extraction: zip the token array with its own tail
      val bi = toks.select(explode(arrays_zip(
          slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))).as("w1"),
          slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0))).as("w2")))
          .as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      val uni = toks.select(explode(col("toks")).as("w"))
      val bc = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
      val uc = uni.groupBy("w").agg(count(lit(1)).as("c_w"))
      val tot = bi.agg(count(lit(1)).as("t_bi"))
        .crossJoin(uni.agg(count(lit(1)).as("t_u")))
      bc.join(uc.withColumnRenamed("w", "w1").withColumnRenamed("c_w", "c1"), "w1")
        .join(uc.withColumnRenamed("w", "w2").withColumnRenamed("c_w", "c2"), "w2")
        .crossJoin(broadcast(tot))
        .filter(col("c_xy") >= 5)
        .select(col("w1"), col("w2"), col("c_xy"),
          round(log((col("c_xy") * lit(1.0) / col("t_bi")) /
                    ((col("c1") * lit(1.0) / col("t_u")) *
                     (col("c2") * lit(1.0) / col("t_u")))), 4).as("pmi"))
        .orderBy(col("pmi").desc, col("w1"), col("w2"))
        .limit(20)
    },

    Q("q52_dist_stats",
      """Q52 — per-language distribution statistics: exact interpolated
        |median and p90 of per-document token counts, sample stddev, and
        |the Pearson correlation of token count vs character count — the
        |moment/quantile/corr aggregate surface a dataset-profiling pass
        |runs before training. Scale shape: token counts are computed in
        |the scan projection (narrow), then ONE hash aggregation by lang —
        |stddev/corr reduce via their moment sketches with map-side
        |partials; the exact percentile aggregates per-group value buffers,
        |which is safe at the declared group cardinality (languages —
        |bounded and small); an unbounded group domain would swap in
        |approx_percentile, the declared q20b-style trade.""".stripMargin,
      """WITH t AS (SELECT lang, n_chars, len(string_split(text, ' ')) AS toks
        |           FROM documents)
        |SELECT lang,
        |  count(*) AS n_docs,
        |  round(quantile_cont(toks, 0.5), 4) AS med_toks,
        |  round(quantile_cont(toks, 0.9), 4) AS p90_toks,
        |  round(stddev_samp(toks), 4) AS sd_toks,
        |  round(corr(toks, n_chars), 4) AS corr_toks_chars
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("lang"), col("n_chars"),
          size(TextOps.tokens(col("text"))).as("toks"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          round(percentile(col("toks"), lit(0.5)), 4).as("med_toks"),
          round(percentile(col("toks"), lit(0.9)), 4).as("p90_toks"),
          round(stddev_samp(col("toks")), 4).as("sd_toks"),
          round(corr(col("toks"), col("n_chars")), 4).as("corr_toks_chars"))
        .transform(Relational.smallSort(_, "lang"))
    },

    Q("q57_bigram_lm",
      """Q57 — statistical LM quality signal (the CCNet/Gopher-style
        |perplexity proxy): train add-k-smoothed bigram counts over the
        |corpus itself and score every document by the mean log-probability
        |of its bigrams, ln((c(w1,w2) + 0.5) / (c(w1) + 0.5·V)) — documents
        |whose word transitions are unusual under the corpus's own bigram
        |model (gibberish, boilerplate soup, wrong-language fragments)
        |score low and become filter candidates. Scale shape: bigram
        |extraction is NARROW (each token array zipped with its own tail);
        |the stream is scanned and shuffled ONCE — by (w1,w2) into a hash
        |JOIN against the reduced count table, not into window sorts:
        |c(w1,w2) aggregates with map-side combine (only reduced pairs
        |shuffle), c(w1) = Σ_w2 c(w1,w2) rides a sum window over the
        |REDUCED table's w1 groups (pair-cardinality, never
        |stream-cardinality), and the stream probes it on (w1,w2). The
        |double count-window form (c_w and c_xy riding one w1-keyed
        |exchange) pays two stream-cardinality SORTS for the same single
        |shuffle — measured 0.78 vs 0.66 s at sf0.1 (DevQ57, r9).
        |Broadcasting the count table stays forbidden (a web-scale bigram
        |vocabulary is heavy-tailed and effectively unbounded — the join
        |is shuffle_hash with the reduced table as build side); per-doc
        |means then reduce with map-side partial sum/count. A heavy-hitter
        |context word ("the") concentrates one join-probe partition
        |exactly as it would one window group — same skew bound; the
        |salted two-phase count attach for the head of the distribution
        |is the documented 100 TB variant. The vocab size V is a 1-row
        |broadcast scalar. avg rounds at 4 dp (the §7.3 double
        |rule).""".stripMargin,
      """WITH tok AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
        |ix AS (SELECT doc_id, unnest(toks) AS t, generate_subscripts(toks, 1) AS i
        |       FROM tok),
        |bi AS (SELECT a.doc_id, a.t AS w1, b.t AS w2 FROM ix a JOIN ix b
        |       ON a.doc_id = b.doc_id AND b.i = a.i + 1),
        |v AS (SELECT count(DISTINCT t) AS v FROM ix),
        |cx AS (SELECT w1, w2, count(*) AS c_xy FROM bi GROUP BY 1, 2),
        |cw AS (SELECT w1, count(*) AS c_w FROM bi GROUP BY 1),
        |sc AS (SELECT bi.doc_id, ln((c_xy + 0.5) / (c_w + 0.5 * v.v)) AS lp
        |       FROM bi JOIN cx USING (w1, w2) JOIN cw USING (w1) CROSS JOIN v)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |       round(avg(lp), 4) AS lm_score
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      val bi = toks.select(col("doc_id"), explode(arrays_zip(
          slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))).as("w1"),
          slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0))).as("w2")))
          .as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      val v = toks.select(explode(col("toks")).as("t"))
        .agg(countDistinct(col("t")).as("v"))
      val cxy = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
        .withColumn("c_w", sum(col("c_xy")).over(Window.partitionBy("w1")))
      bi
        .join(cxy.hint("shuffle_hash"), Seq("w1", "w2"))
        .crossJoin(broadcast(v))
        .select(col("doc_id"),
          log((col("c_xy") + lit(0.5)) / (col("c_w") + lit(0.5) * col("v")))
            .as("lp"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), round(avg(col("lp")), 4).as("lm_score"))
        .orderBy("doc_id")
    },

    Q("q59_source_drift",
      """Q59 — per-source distribution drift: Jensen–Shannon divergence
        |between each source's unigram token distribution and the whole
        |corpus's — the monitoring query a pre-training team runs after a
        |crawl refresh to see which sources shifted (JSD is symmetric,
        |bounded [0, ln 2], and defined even where supports differ, unlike
        |raw KL). Tokens the source never emits still contribute to its
        |divergence; instead of enumerating the absent vocabulary (a
        |per-source anti-join against the full token table), the absent
        |mass folds into the closed form Σ_absent 0.5·q·ln 2
        |= 0.5·ln 2·(1 − Σ_present q), so only (source, token) support
        |rows are ever materialized. Scale shape: per-doc token counts
        |come from the one-pass tokenCounts kernel inside the scan
        |projection (the q45 lesson — token INSTANCES never shuffle; the
        |one wide exchange carries pre-reduced (source, token, tf)
        |partials with map-side combine); corpus token mass then attaches
        |via a sum window over token and source mass via a sum window
        |over source, and the final per-source reduce reuses the source
        |exchange (HashPartitioning(source) already satisfies it), so the
        |distinct-pair table shuffles twice and nothing vocabulary-sized
        |is broadcast — the corpus total is a 1-row broadcast scalar. A
        |stopword's token-window group holds ≤ #sources rows, so the
        |heavy head of the vocabulary cannot skew a partition. jsd
        |rounds at 4 dp (the §7.3 double rule).""".stripMargin,
      """WITH tok AS (SELECT source, unnest(string_split(text,' ')) AS token FROM documents),
        |c AS (SELECT source, token, count(*) AS n FROM tok GROUP BY 1, 2),
        |g AS (SELECT token, sum(n) AS gn FROM c GROUP BY 1),
        |st AS (SELECT source, sum(n) AS stot FROM c GROUP BY 1),
        |tot AS (SELECT sum(n) AS gt FROM c),
        |terms AS (SELECT c.source, c.n * 1.0 / st.stot AS p, g.gn * 1.0 / tot.gt AS q
        |          FROM c JOIN g USING (token) JOIN st ON c.source = st.source
        |          CROSS JOIN tot)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_distinct_tokens,
        |       round(sum(0.5*p*ln(p/((p+q)/2)) + 0.5*q*ln(q/((p+q)/2)))
        |             + 0.5*ln(2)*(1 - sum(q)), 4) AS jsd
        |FROM terms GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      val pairs = Tables.documents(s, d)
        .select(col("source"),
          explode(graft.functions.expressions.NativeExprs
            .tokenCounts(col("text"))).as("tc"))
        .select(col("source"), col("tc.token").as("token"),
                col("tc.tf").cast(LongType).as("tf"))
        .groupBy("source", "token").agg(sum(col("tf")).as("n"))
      val tot = pairs.agg(sum(col("n")).as("gt"))
      pairs
        // token window FIRST, then source: the per-source reduce below
        // rides the source exchange instead of adding a third shuffle
        .withColumn("gn", sum(col("n")).over(Window.partitionBy("token")))
        .withColumn("stot", sum(col("n")).over(Window.partitionBy("source")))
        .crossJoin(broadcast(tot))
        .select(col("source"),
          (col("n") / col("stot")).as("p"),
          (col("gn") / col("gt")).as("q"))
        .withColumn("m", (col("p") + col("q")) / lit(2.0))
        .groupBy("source")
        .agg(count(lit(1)).as("n_distinct_tokens"),
          round(
            sum(lit(0.5) * col("p") * log(col("p") / col("m"))
              + lit(0.5) * col("q") * log(col("q") / col("m")))
            + lit(0.5) * log(lit(2.0)) * (lit(1.0) - sum(col("q"))),
            4).as("jsd"))
        .transform(Relational.smallSort(_, "source"))
    },

    Q("q60_label_outliers",
      """Q60 — semantic outliers per label: the 5 embeddings least similar
        |(cosine) to their own label's centroid — the "does this document
        |belong in its cluster?" audit a labeled/clustered corpus gets
        |before the labels feed sampling or eval splits (low scorers are
        |mislabeled docs, noise, or boundary cases). Scale shape: the
        |centroid is the typed VecAvg Aggregator — every task folds its
        |rows into ONE d-length double buffer, so the centroid exchange
        |carries a (d·8 B, count) partial per (mapper, label), NOT n·d
        |exploded dimension rows, and reduce parallelism is not capped at
        |d (the posexplode + groupBy(pos) formulation has both defects —
        |that shape is the DuckDB oracle, not the engine); the finished
        |(label, centroid) table is #labels rows and broadcasts into the
        |scan-side join, so scoring is one narrow pass over the corpus
        |with the double-precision HOF dot inside codegen; the bottom-5
        |cut is the bounded TopKAgg buffer (≤5 entries per (mapper,
        |label) shuffle), not a window sort of every scored row. Ranking
        |happens on the ROUNDED score with a vec_id tie-break (the q45
        |rule), and ±0.0 is normalized on both engines (cosines here
        |straddle zero; repr(-0.0) ≠ repr(0.0) in the hash compare).""".stripMargin,
      """WITH dims AS (SELECT vec_id, label,
        |              unnest(CAST(embedding AS DOUBLE[])) AS v,
        |              generate_subscripts(CAST(embedding AS DOUBLE[]), 1) AS d
        |       FROM embeddings),
        |cen AS (SELECT label, d, avg(v) AS c FROM dims GROUP BY 1, 2),
        |sc AS (SELECT dims.vec_id, dims.label,
        |              round(sum(v*c) / (sqrt(sum(v*v)) * sqrt(sum(c*c))), 4) + 0.0 AS score
        |       FROM dims JOIN cen USING (label, d) GROUP BY 1, 2),
        |rk AS (SELECT label, vec_id, score,
        |              row_number() OVER (PARTITION BY label
        |                                 ORDER BY score ASC, vec_id) AS rnk
        |       FROM sc)
        |SELECT label, CAST(rnk AS INT) AS rnk, vec_id, score
        |FROM rk WHERE rnk <= 5 ORDER BY label, rnk""".stripMargin) { (s, d) =>
      import graft.functions.VectorOps
      val vecAvg = udaf(graft.functions.Aggs.VecAvg)
      val emb = Tables.embeddings(s, d)
      val cen = emb.groupBy("label").agg(vecAvg(col("embedding")).as("c"))
      val scored = emb
        .join(broadcast(cen), Seq("label"))
        .select(col("label"), col("vec_id"),
          col("embedding").cast(ArrayType(DoubleType)).as("v"), col("c"))
        .select(col("label"), col("vec_id"),
          (round(VectorOps.dotHof(col("v"), col("c"))
            / (sqrt(VectorOps.dotHof(col("v"), col("v")))
               * sqrt(VectorOps.dotHof(col("c"), col("c")))), 4)
            + lit(0.0)).as("score"))
      // bottom-5 ascending = top-5 of the negated score; tag tie-break is
      // vec_id ASC on both forms. 0.0 − x un-negates without minting −0.0.
      graft.operators.TopK.perGroup(
          scored.withColumn("neg", lit(0.0) - col("score")),
          Seq("label"), "neg", "vec_id", 5)
        .select(col("label"), col("rnk"), col("vec_id"),
          (lit(0.0) - col("neg")).as("score"))
        .transform(Relational.smallSort(_, "label", "rnk"))
    },

    Q("q61_cluster_profile",
      """Q61 — anchor-codebook cluster profile: assign every embedding to
        |its most-cosine-similar of K=256 fixed anchors (the K lowest
        |vec_ids — a deterministic stand-in for a trained IVF/k-means
        |codebook, which is what production plugs in) and report each
        |cluster's population and affinity — the semantic-balance profile
        |read before cluster-aware sampling or SemDeDup-style pruning
        |(empty/over-full clusters mean the codebook no longer fits the
        |corpus). Scale shape: the codebook is a PLAN LITERAL — one
        |bounded K-row collect (K·(4d+16) bytes, constant by design; the
        |HeavyHitters ≤m bounded-collect class) folds it into the
        |expression tree, so the main pass is a single scan+kernel+
        |256-group aggregate with no join at all (r14; the previous
        |broadcast-1-row cross join re-plumbed the anchors struct
        |through every row and measured ~20 % slower — DevQ61 rep
        |tables). The argmax happens PER ROW via the best_anchor kernel
        |— one compiled loop over a DECODED primitive-array codebook
        |(cached per backing buffer, r14; anchor norms precomputed; tie
        |→ lowest anchor_id; NaN-greatest double ordering) — so the
        |corpus-sized stream is never exploded, shuffled, OR sorted.
        |Slower forms measured and recorded (sf0.1): exploding K rows
        |per embedding and aggregating max(struct) per vec_id degrades
        |to TWO SortAggregates around a 512k-row exchange (0.79 s);
        |array_max(transform(...)) pays ~0.7 µs of interpreted-lambda
        |overhead per anchor eval (0.71 s); the ArrayData-getter kernel
        |0.37 s; this form 0.30 s (value-pinned by NativeExprsSpec). Only the K-row profile aggregate shuffles.
        |Determinism (two measured traps,
        |both sf0.01 mismatches before this form): (1) an avg of rounded
        |DOUBLES flips its own 4 dp rounding boundary with summation
        |order, so per-row scores scale to exact integer ten-thousandths
        |(the q47 long-cents rule) and cluster sums are order-independent
        |int64 arithmetic; (2) that exactness GUARANTEES the mean lands on
        |.00005 decimal boundaries, where the engines' round() disagree on
        |IDENTICAL doubles (Spark rounds the shortest decimal repr, DuckDB
        |rounds the binary value) — so the half-up rounding happens in
        |INTEGER space ((2s+n) div 2n, sign-symmetric) and the only float
        |op left is a division by 10⁴, bit-identical everywhere.
        |EAGER BUILD (deliberate, r14 ADVICE): folding the codebook into
        |a literal means the builder runs its bounded 256-row collect —
        |one small Spark job — at DataFrame-CONSTRUCTION time, unlike
        |every other catalog entry; explain-only tooling that builds
        |this query pays that job, and an unreadable embeddings table
        |fails at build instead of first action.""".stripMargin,
      """WITH anc AS (SELECT vec_id AS anchor_id, CAST(embedding AS DOUBLE[]) AS av
        |             FROM embeddings ORDER BY vec_id LIMIT 256),
        |sc AS (SELECT e.vec_id, a.anchor_id,
        |         list_dot_product(CAST(e.embedding AS DOUBLE[]), a.av)
        |           / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
        |            * sqrt(list_dot_product(a.av, a.av))) AS score
        |       FROM embeddings e CROSS JOIN anc a),
        |best AS (SELECT vec_id, anchor_id,
        |           CAST(round(score * 10000) AS BIGINT) AS si,
        |           row_number() OVER (PARTITION BY vec_id
        |                              ORDER BY score DESC, anchor_id) AS rnk
        |         FROM sc)
        |SELECT anchor_id AS cluster, count(*) AS n,
        |       CAST(CASE WHEN sum(si) >= 0
        |              THEN (2 * sum(si) + count(*)) // (2 * count(*))
        |              ELSE -((2 * -sum(si) + count(*)) // (2 * count(*)))
        |            END AS BIGINT) / 10000.0 AS avg_score,
        |       min(si) / 10000.0 AS min_score
        |FROM best WHERE rnk = 1 GROUP BY 1 ORDER BY cluster""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      // Codebook as a PLAN LITERAL (r14, DevQ61 dissection): one bounded
      // 256-row collect (K is constant by design — the HeavyHitters ≤m
      // bounded-collect class) replaces the broadcast-subquery job, the
      // 1-row collect_list stage and the cross-join machinery; the main
      // pass is then a single scan+kernel+tiny-agg plan, and the stable
      // literal lets the kernel's decoded-codebook cache hit on every
      // row (measured 0.37 s → 0.30 s steady at sf0.1; the broadcast
      // form's per-row struct plumbing was the difference). The driver
      // norm fold matches VectorOps.dot's left-to-right double
      // accumulation bit-for-bit (parity-checked in DevQ61).
      val anchors: Seq[Anchor] = emb.orderBy("vec_id").limit(256)
        .select(col("vec_id").cast(LongType).as("anchor_id"), col("embedding"))
        .collect().toIndexedSeq
        .map { r =>
          val av = r.getSeq[Float](1)
          var ss = 0.0
          av.foreach(x => ss += x.toDouble * x.toDouble)
          Anchor(r.getLong(0), av, math.sqrt(ss))
        }.sortBy(_.anchor_id)
      emb
        .select(col("vec_id"),
          graft.functions.expressions.NativeExprs
            .bestAnchor(col("embedding"), typedLit(anchors)).as("b"))
        .select(col("b.anchor_id").as("cluster"),
          round(col("b.score") * 10000, 0).cast(LongType).as("si"))
        .groupBy("cluster")
        .agg(count(lit(1)).as("n"), sum(col("si")).as("ssum"),
          min(col("si")).as("smin"))
        .select(col("cluster"), col("n"),
          (when(col("ssum") >= 0, expr("(2 * ssum + n) div (2 * n)"))
            .otherwise(-expr("(2 * -ssum + n) div (2 * n)")) / 10000.0)
            .as("avg_score"),
          (col("smin") / 10000.0).as("min_score"))
        .transform(Relational.smallSort(_, "cluster"))
    },

    Q("q64_semdedup",
      """Q64 — SemDeDup-style within-cluster semantic pruning: assign every
        |embedding to its best anchor (q61's codebook), then inside each
        |cluster drop any vector whose cosine to a LOWER-id cluster member
        |reaches the threshold (keep-min — the same deterministic survivor
        |rule as q28/q31). Output = the dropped set with its earliest
        |qualifying ancestor and strongest similarity. This is the
        |candidate-bounding contrast to q33's blocked all-pairs: pairs form
        |ONLY within clusters, so the comparison count is Σ cᵢ² (cluster
        |sizes, audited by q61's profile) instead of n² — the reason
        |SemDeDup scales to corpus-sized embedding tables. Scale shape:
        |the 1-row codebook broadcasts and assignment is one narrow
        |kernel pass (best_anchor, no explode/sort/window — q61's audited
        |form) with the row norm computed once; the self-join shuffles the
        |assignment frame ONCE on the cluster key (shuffle_hash — bucket
        |lists have no useful sort order) and the codegen'd float dot
        |scores pairs in-loop; an over-full cluster (codebook drift) is
        |the q61 profile's alarm and the salting seam, not this plan's.
        |Threshold note (the q63 rule): production SemDeDup prunes at
        |cos ≥ 0.9ish; this corpus's synthetic embeddings max out at
        |~0.6 within-cluster, so 0.9/0.8/0.7 surface ZERO pairs and 0.40
        |is the demonstrating cut (31 dropped at sf0.01, 198 at sf0.1).
        |Comparisons stay on integer ten-thousandths (si ≥ 4000) so the
        |threshold never reads a float's low bits.""".stripMargin,
      """WITH anc AS (SELECT vec_id AS anchor_id, CAST(embedding AS DOUBLE[]) AS av
        |             FROM embeddings ORDER BY vec_id LIMIT 256),
        |sc AS (SELECT e.vec_id, a.anchor_id,
        |         list_dot_product(CAST(e.embedding AS DOUBLE[]), a.av)
        |           / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
        |            * sqrt(list_dot_product(a.av, a.av))) AS score
        |       FROM embeddings e CROSS JOIN anc a),
        |best AS (SELECT vec_id, anchor_id,
        |           row_number() OVER (PARTITION BY vec_id
        |                              ORDER BY score DESC, anchor_id) AS rnk
        |         FROM sc),
        |asg AS (SELECT b.vec_id, b.anchor_id AS cluster, CAST(e.embedding AS DOUBLE[]) AS v
        |        FROM best b JOIN embeddings e USING (vec_id) WHERE rnk = 1),
        |pr AS (SELECT a.cluster, a.vec_id, b.vec_id AS o,
        |         CAST(round(list_dot_product(a.v, b.v)
        |           / (sqrt(list_dot_product(a.v, a.v))
        |            * sqrt(list_dot_product(b.v, b.v))) * 10000) AS BIGINT) AS si
        |       FROM asg a JOIN asg b ON a.cluster = b.cluster AND b.vec_id < a.vec_id)
        |SELECT vec_id, cluster, min(o) AS dup_of, max(si) / 10000.0 AS max_sim
        |FROM pr WHERE si >= 4000 GROUP BY 1, 2 ORDER BY vec_id""".stripMargin) { (s, d) =>
      import graft.functions.VectorOps
      val emb = Tables.embeddings(s, d)
      val codebook = emb.orderBy("vec_id").limit(256)
        .select(col("vec_id").as("anchor_id"), col("embedding").as("av"),
          sqrt(VectorOps.dot(col("embedding"), col("embedding"))).as("an"))
        .agg(sort_array(collect_list(
          struct(col("anchor_id"), col("av"), col("an")))).as("anchors"))
      // both sides of the cluster self-join read this frame — persist so
      // the scan + assignment kernel run once, not once per side (Verify/
      // Bench clearCache() between queries; at corpus scale this frame is
      // the natural checkpoint artifact)
      val asg = emb
        .crossJoin(broadcast(codebook))
        .select(col("vec_id"),
          graft.functions.expressions.NativeExprs
            .bestAnchor(col("embedding"), col("anchors"))
            .getField("anchor_id").as("cluster"),
          col("embedding"),
          sqrt(VectorOps.dot(col("embedding"), col("embedding"))).as("nrm"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val lo = asg.select(col("cluster"), col("vec_id").as("o"),
        col("embedding").as("eb"), col("nrm").as("nb"))
      asg.select(col("cluster"), col("vec_id"),
          col("embedding").as("ea"), col("nrm").as("na"))
        .hint("shuffle_hash")
        .join(lo, Seq("cluster"))
        .filter(col("o") < col("vec_id"))
        .select(col("vec_id"), col("cluster"), col("o"),
          round(VectorOps.cosinePrenorm(
              VectorOps.dot(col("ea"), col("eb")), col("na"), col("nb"))
            * 10000, 0).cast(LongType).as("si"))
        .filter(col("si") >= 4000)
        .groupBy("vec_id", "cluster")
        .agg(min(col("o")).as("dup_of"),
          (max(col("si")) / 10000.0).as("max_sim"))
        .orderBy("vec_id")
    },

    Q("q70_vocab_ttr",
      """Q70 — lexical-diversity profile per source: token mass, distinct
        |types, hapax legomena (types occurring exactly once in the
        |source) and the type-token ratio — the cheap first screen for
        |template/boilerplate sources (machine-generated feeds sit at
        |anomalously low TTR and near-zero hapax share; a crawl of
        |genuinely distinct pages sits high on both) read next to q59's
        |distributional drift and q67's overlap matrix before mixture
        |weighting. Scale shape: per-doc token counts come from the
        |one-pass tokenCounts kernel inside the scan projection (the q45
        |lesson — token INSTANCES never shuffle; the one wide exchange
        |carries pre-reduced (source, token, tf) partials with map-side
        |combine at per-doc-distinct granularity); the per-source rollup
        |then aggregates the distinct-pair table (≤ vocab × sources
        |rows), doc counts ride a separate narrow count whose
        |source-cardinality result broadcasts into the final join, and
        |nothing vocabulary-sized is ever broadcast or collected.""".stripMargin,
      """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS t
        |             FROM documents),
        |tc AS (SELECT source, t, count(*) AS c FROM tok GROUP BY 1, 2),
        |st AS (SELECT source, sum(c) AS n_tokens, count(*) AS n_types,
        |              sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS n_hapax
        |       FROM tc GROUP BY source),
        |nd AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source)
        |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
        |       CAST(n_tokens AS BIGINT) AS n_tokens,
        |       CAST(n_types AS BIGINT) AS n_types,
        |       CAST(n_hapax AS BIGINT) AS n_hapax,
        |       round(n_types * 1.0 / n_tokens, 4) AS ttr
        |FROM st JOIN nd USING (source) ORDER BY source""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val tc = docs
        .select(col("source"),
          explode(graft.functions.expressions.NativeExprs
            .tokenCounts(col("text"))).as("tc"))
        .select(col("source"), col("tc.token").as("token"),
          col("tc.tf").cast(LongType).as("tf"))
      val st = tc.groupBy("source", "token").agg(sum(col("tf")).as("c"))
        .groupBy("source")
        .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_types"),
          sum(when(col("c") === 1L, 1L).otherwise(0L)).as("n_hapax"))
      val nd = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
      st.join(broadcast(nd), Seq("source"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("n_types"), col("n_hapax"),
          round(col("n_types") * 1.0 / col("n_tokens"), 4).as("ttr"))
        .transform(Relational.smallSort(_, "source"))
    },

    Q("q71_retention",
      """Q71 — weekly cohort-retention matrix over the event stream (the
        |behavioral companion to q30's sessions and q46's funnel): users
        |cohorted by first-active epoch-week, each later active week
        |counted once per user, retention = cohort share still active at
        |each offset. Scale shape: ONE user-key shuffle total — active
        |days aggregate to a bounded per-user set (collect_set with
        |map-side partials; cardinality is capped by the observation
        |window, the q46 bounded-state rule) and EVERY per-user
        |derivation (first day, cohort week, distinct week offsets) is a
        |local array HOF on that set, so no second exchange, no
        |user-dimension broadcast, and no countDistinct expand — the
        |(user, offset) stream arrives pre-deduplicated and the matrix
        |aggregate is a plain count at #weeks² cardinality. Cohort sizes
        |attach via a window over the TINY aggregated matrix (offset-0
        |row always exists: d0 itself). Weeks are pure integer
        |arithmetic on epoch days — no engine week-truncation semantics
        |to disagree over.""".stripMargin,
      """WITH fe AS (SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id),
        |act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |j AS (SELECT DISTINCT f.user_id,
        |        CAST((f.d0 - DATE '1970-01-01') // 7 AS INT) AS cohort_week,
        |        CAST((a.d - f.d0) // 7 AS INT) AS week_offset
        |      FROM fe f JOIN act a ON a.user_id = f.user_id),
        |ret AS (SELECT cohort_week, week_offset, count(*) AS n_users
        |        FROM j GROUP BY 1, 2),
        |cs AS (SELECT cohort_week, n_users AS cohort_size FROM ret WHERE week_offset = 0)
        |SELECT r.cohort_week, r.week_offset, CAST(r.n_users AS BIGINT) AS n_users,
        |       CAST(cs.cohort_size AS BIGINT) AS cohort_size,
        |       round(r.n_users * 1.0 / cs.cohort_size, 4) AS retention
        |FROM ret r JOIN cs USING (cohort_week)
        |ORDER BY cohort_week, week_offset""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("ts").cast(DateType).as("d"))
      val perUser = ev.groupBy("user_id").agg(collect_set(col("d")).as("days"))
      val epoch = to_date(lit("1970-01-01"))
      val offsets = perUser
        .select(col("user_id"), array_min(col("days")).as("d0"), col("days"))
        .select(
          floor(datediff(col("d0"), epoch) / 7).cast(IntegerType)
            .as("cohort_week"),
          explode(array_distinct(transform(col("days"),
            dd => floor(datediff(dd, col("d0")) / 7).cast(IntegerType))))
            .as("week_offset"))
      val ret = offsets.groupBy("cohort_week", "week_offset")
        .agg(count(lit(1)).as("n_users"))
      val w = Window.partitionBy("cohort_week")
      ret
        .withColumn("cohort_size",
          sum(when(col("week_offset") === 0, col("n_users"))).over(w))
        .select(col("cohort_week"), col("week_offset"), col("n_users"),
          col("cohort_size"),
          round(col("n_users") * 1.0 / col("cohort_size"), 4).as("retention"))
        .transform(Relational.smallSort(_, "cohort_week", "week_offset"))
    },

    Q.cap("q72_approx_quantiles",
      """Q72 — sketch-based quantiles per event type (p50/p90/p99 of
        |value via percentile_approx, accuracy 10 000): the
        |bounded-memory companion to q52's EXACT percentile surface and
        |the q16b HLL precedent for sketch aggregates. At 100 TB an
        |exact per-group percentile needs the group's values sorted
        |somewhere; the Greenwald–Khanna summary is one scan with
        |MERGEABLE bounded buffers (map-side partials like any hash
        |agg), rank error ≤ n/accuracy, and accuracy — not data size —
        |is the memory lever. No DuckDB oracle (the sketch's picked
        |elements are implementation-defined); CatalogSpec asserts the
        |rank-error CONTRACT against exact sorted ranks per group — at
        |test n the bound degenerates to exactness, so the assert is
        |tight, not vacuous.""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50"),
          percentile_approx(col("value"), lit(0.9), lit(10000)).as("p90"),
          percentile_approx(col("value"), lit(0.99), lit(10000)).as("p99"))
        .transform(Relational.smallSort(_, "event_type"))
    },

    Q("q87_event_transitions",
      """Q87 — first-order Markov transition matrix over the event stream
        |(the trajectory-bigram profile an agent-trace or clickstream
        |training pipeline computes before sequence modeling): for each
        |user, consecutive events ordered by (ts, event_id) form a
        |transition when separated by <= 30 minutes (the q30 session gap);
        |output is per (src_type, dst_type) count plus the row-normalized
        |transition probability in integer ten-thousandths ((2·10⁴·n + s)
        |div (2·s) — the q61 half-up rule, so the boundary rounding is
        |engine-exact). Timestamps compare as epoch-MICROS on both engines
        |(a seconds cast would truncate sub-second gaps differently).
        |Scale shape: ONE user-keyed exchange carries the lead() window;
        |transitions then reduce to a #types²-row table, and the
        |normalizing sum rides a window on that tiny aggregate — the
        |corpus is never shuffled twice. At 100 TB this is the q30/q71
        |sessionization economics: everything after the per-user window
        |is constant-size.""".stripMargin,
      q87OracleSql) { (s, d) =>
      sessionTransitions(Tables.events(s, d))
    },

    Q("q90_volume_anomaly",
      """Q90 — per-event-type daily volume anomaly screen (the
        |crawl/ingest monitoring read next to q59's distribution drift):
        |days whose event count sits ≥ 1.5 sample standard deviations from
        |the type's mean, with the z-score. Determinism across engines:
        |mean and variance are derived from EXACT integer sums (Σn, Σn²,
        |day count — the textbook nd·Σn²−(Σn)² form, exact in BIGINT at
        |any real cardinality), so the doubles that enter the z division
        |are bit-identical on both sides — no engine's streaming-moment
        |stddev implementation is trusted (the q61 float lesson applied to
        |second moments). Scale shape: the raw stream reduces ONCE to the
        |(type × day) count table (map-side combined); the per-type moment
        |aggregate is #types rows and broadcasts back; the anomaly filter
        |runs on the tiny count table. At 100 TB this is one scan + two
        |trivial exchanges.""".stripMargin,
      """WITH d AS (SELECT event_type, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
        |           count(*) AS n FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, count(*) AS nd, sum(n) AS s1, sum(n * n) AS s2
        |       FROM d GROUP BY 1)
        |SELECT d.event_type, d.day, CAST(n AS BIGINT) AS n,
        |  round((n - s1 * 1e0 / nd) /
        |        sqrt((nd * s2 - s1 * s1) * 1e0 / (nd * (nd - 1))), 4) AS z
        |FROM d JOIN st USING (event_type)
        |WHERE nd > 1 AND nd * s2 > s1 * s1
        |  AND abs((n - s1 * 1e0 / nd) /
        |          sqrt((nd * s2 - s1 * s1) * 1e0 / (nd * (nd - 1)))) >= 15e-1
        |ORDER BY event_type, day""".stripMargin) { (s, d) =>
      // the (type × day) table feeds both the moment aggregate and the
      // anomaly filter — persist so events scan once (the r7 double-scan
      // rule; released by the session clearCache contract)
      val dcnt = Tables.events(s, d)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(count(lit(1)).as("n"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val st = dcnt.groupBy("event_type")
        .agg(count(lit(1)).as("nd"), sum(col("n")).as("s1"),
          sum(col("n") * col("n")).as("s2"))
      val z = (col("n") - col("s1") * lit(1.0) / col("nd")) /
        sqrt((col("nd") * col("s2") - col("s1") * col("s1")) * lit(1.0) /
          (col("nd") * (col("nd") - 1)))
      dcnt.join(broadcast(st), Seq("event_type"))
        .filter(col("nd") > 1 &&
          col("nd") * col("s2") > col("s1") * col("s1"))
        .withColumn("z", z)
        .filter(abs(col("z")) >= 1.5)
        .select(col("event_type"), col("day"), col("n"),
          round(col("z"), 4).as("z"))
        .transform(Relational.smallSort(_, "event_type", "day"))
    },

    Q("q97_pit_features",
      """Q97 — point-in-time feature backfill (the leakage-free feature
        |join a training pipeline materializes before joining labels):
        |per (user, calendar day), the user's LAST event value at or
        |before that day's end — last-within-day by (ts, event_id) DESC,
        |forward-filled across the user's event-less days, never reading
        |the future. value passes through UNTOUCHED (no arithmetic — both
        |engines surface the identical parquet doubles), day is the q90
        |epoch-day BIGINT. Scale shape: last-within-day is a max_by hash
        |AGGREGATE on the totally-ordered (us, event_id) struct — map-side
        |combinable, so only (user, day)-grain partials cross the ONE
        |keyed exchange and the event stream is never sorted (r13,
        |DevQ97; deterministically identical to the row_number window);
        |the grid is each user's first-event day through the corpus
        |horizon — the horizon attaches as a proven-1-row scalar (the
        |q48/q65 cross-join pattern) and the day range explodes from a
        |codegen'd sequence, so days before a user's first event never
        |even exist; the forward fill is a user-keyed running
        |`last(ignoreNulls)` over ≤ #days rows per user — per-user state
        |is bounded by the calendar, not the event count, so a hot user
        |costs the same as any other. Output is the training-matrix
        |grain itself.""".stripMargin,
      q97OracleSql) { (s, d) =>
      pitFeatures(Tables.events(s, d))
    },

    Q("q98_session_itemsets",
      """Q98 — frequent event-type 2-itemsets at the SESSION grain (the
        |market-basket read over behavioral streams: which event types
        |co-occur within one visit): sessions are q30's 30-minute-gap
        |cuts; a session's distinct type set yields its (a < b) pairs;
        |output is per-pair co-occurrence count, session support and
        |lift, both integer half-up ten-thousandths (the q61/q87 rule —
        |no float crosses engines; at extreme session counts the lift
        |numerator 2·10⁴·ns·n_ab is the 128-bit/decimal lever, noted not
        |needed below ~4.6e14 session-pairs). The USER grain is
        |degenerate on this corpus (every user reaches all 5 types) —
        |sessions are the informative basket, measured first. Scale
        |shape: the sessionize window and the (user, sid) reduction ride
        |ONE user-keyed exchange (HashPartitioning(user_id) satisfies
        |the (user_id, sid) clustering — the q57 lesson); per-session
        |state is the bounded distinct-type set (≤ #types), pairs expand
        |from that tiny array locally (HOF lambdas over ≤ #types
        |elements, NOT per-token work — the q83 interpreted-lambda
        |budget is per-session constant), and everything after is
        |#types²-row: the support scalar is a proven-1-row cross join,
        |the per-type session counts broadcast twice.""".stripMargin,
      q98OracleSql) { (s, d) =>
      sessionItemsets(Tables.events(s, d))
    },

    Q("q99_length_ks",
      """Q99 — per-source two-sample Kolmogorov–Smirnov drift of the
        |document-length distribution vs the REST of the corpus (the
        |distribution-shape companion to q59's token-content JSD: a
        |source whose length profile diverges — truncation bugs,
        |template farms, concatenation errors — surfaces here even when
        |its vocabulary looks normal). INTEGER-exact: the KS supremum is
        |max over observed lengths of |cum_s·(n−n_s) − (gcum−cum_s)·n_s|
        |— CDFs compared by cross-multiplication so no division happens
        |until the final half-up e4 quantization (exact in BIGINT up to
        |~3e9 docs; beyond that the DECIMAL(38) lever). The global CDF
        |is never computed with a global window: gcum = Σ over sources
        |of cum_s at each length (CDFs are additive), a #sources-row
        |window per length on the grid. Scale shape: the corpus reduces
        |ONCE to the (source, len) count table; the evaluation grid is
        |#sources × #distinct-lengths (length cardinality is bounded by
        |the doc-size range, not the corpus), built by exploding the
        |1-row sorted length array; two tiny windows and a #sources-row
        |rollup finish it. Sources with no complement (single-source
        |corpus) are guarded out of the division.""".stripMargin,
      q99OracleSql) { (s, d) =>
      lengthKs(Tables.documents(s, d))
    },

    Q("q100_length_clip",
      """Q100 — per-source p90 length-winsorization accounting (the
        |truncate-the-tail preprocessing decision: what does clipping
        |every doc at its source's 90th length percentile cost): p90 is
        |the EXACT order statistic — the ceil(0.9·n)-th smallest n_chars
        |(integer rank arithmetic, (90·n + 99) div 100 — no engine
        |percentile-interpolation semantics to disagree over, the q52
        |contrast), alongside docs clipped and characters saved. Scale
        |shape: the corpus reduces ONCE to the (source, length) count
        |table and EVERYTHING — cumulative counts, the rank-k threshold
        |(min len with cum ≥ k), the clip rollup — runs on that
        |CARDINALITY-BOUNDED aggregate (bounded by the doc-size range,
        |not the corpus; a row-grain rank window would sort each
        |source's whole slice in one task at 100 TB — rejected, session
        |4). Ties in n_chars leave the rank-k VALUE deterministic.""".stripMargin,
      q100OracleSql) { (s, d) =>
      lengthClip(Tables.documents(s, d))
    },

    Q("q102_length_gini",
      """Q102 — per-source Gini coefficient of document length (the
        |mass-concentration read beside q99's shape drift and q100's
        |tail clip: a source whose token mass concentrates in a few huge
        |documents behaves differently under sampling, packing and
        |per-source caps than one with even mass, at identical means).
        |INTEGER-exact: with lengths ranked ascending (ties broken by
        |doc_id — Σrank·x is invariant within a tie class, so the tie
        |order never surfaces), G = (2·Σ(rank·x) − (n+1)·Σx)/(n·Σx) —
        |every numerator term is an exact BIGINT (Σrank·x ≤ n²·x̄; the
        |DECIMAL(38) lever applies past ~1e9 docs·chars per source) and
        |only the final half-up e4 quantization divides. Scale shape:
        |Σrank·x computes from the (source, length) cumulative table —
        |a tie block of size c at base ranks contributes
        |len·(c·base + c(c+1)/2) — so the whole query runs on the
        |cardinality-bounded aggregate (the q100 rule: no row-grain
        |rank sort); output is #sources rows.""".stripMargin,
      q102OracleSql) { (s, d) =>
      lengthGini(Tables.documents(s, d))
    },

    Q("q104_length_deciles",
      """Q104 — exact per-source length deciles (k = 1..9 order
        |statistics — the full quantile ladder q100's single p90 cut
        |belongs to, feeding length-bucketed packing and mixture
        |decisions): value at rank ceil(k·n/10) = (k·n+9) div 10, pure
        |integer rank arithmetic (no percentile interpolation — the q52
        |contrast at the ladder grain). Scale shape: rank-k value =
        |min(len | cum ≥ rank_k) on the (source, length) cumulative
        |table, so the constant-9 explode and the min-rollup run on the
        |cardinality-bounded aggregate (the q100 rule: no row-grain
        |rank sort). Ties leave every rank-k VALUE deterministic.""".stripMargin,
      q104OracleSql) { (s, d) =>
      lengthDeciles(Tables.documents(s, d))
    },

    Q("q105_activity_gini",
      """Q105 — per-event-type Gini of user activity (the
        |traffic-concentration screen over the behavioral stream: an
        |event type whose volume concentrates in a handful of users is
        |bot traffic or instrumentation noise, not engagement — read
        |beside q90's daily volume anomalies before trusting event
        |counts as signals). Same integer-exact Gini as q102, over
        |per-(type, user) event counts. Scale shape: the stream reduces
        |ONCE to the (type, user) count table (map-side combined),
        |which reduces AGAIN to the (type, count-value) HISTOGRAM —
        |users with equal counts are one q102 tie block — so the
        |per-type rank pass runs over distinct count values
        |(heavy-tailed activity → few), never user-cardinality rows;
        |output is #types rows.""".stripMargin,
      q105OracleSql) { (s, d) =>
      activityGini(Tables.events(s, d))
    },

    Q("q113_time_split",
      """Q113 — day-granular temporal train/test split audit (the
        |TEMPORAL counterpart of q85's content-hash split — forecasting
        |and recommendation corpora split on TIME, and the eval question
        |changes: is each event type represented on both sides of the
        |cut, and how many users straddle it — a straddling user's test
        |events are partially predictable from their train history, the
        |temporal analogue of q86's leakage). The cut is the smallest
        |epoch-day whose cumulative event count reaches ceil(0.8·N) —
        |an exact day-grain order statistic. Scale shape: raw events
        |shuffle EXACTLY once, into the (type, user, day) pre-reduction
        |both output grains re-reduce; the day CDF is neither a global
        |window nor a grid — the day table is calendar-BOUNDED, so the
        |cut is a linear aggregate() scan over one sorted (day, count)
        |array in a proven-1-row frame; train/test masses come from the
        |already-reduced (type, day) table and straddlers from the
        |(type, user) min/max re-key. Pre-1970 rows are guarded out
        |(the q108 rule).""".stripMargin,
      q113OracleSql) { (s, d) =>
      timeSplit(Tables.events(s, d))
    },

    Q("q111_session_rules",
      """Q111 — directional association rules over q98's session baskets:
        |for each ordered type pair (ante → cons) co-occurring in a
        |session, the antecedent's session count and the confidence
        |n_both/n_ante in integer half-up e4 (support and lift are q98's
        |symmetric read; confidence is the asymmetric one — 'sessions
        |that error also purchase' ≠ the converse — the rule form a
        |recommendation/alerting pipeline consumes). Scale shape:
        |identical to q98 — the shared sessionTypeSets base (ONE user
        |exchange), ordered pairs expand locally from the bounded type
        |array (t ≠ u), and everything downstream is ≤ #types²-row with
        |the antecedent counts attached by broadcast.""".stripMargin,
      q111OracleSql) { (s, d) =>
      sessionRules(Tables.events(s, d))
    },

    Q("q107_gap_deciles",
      """Q107 — exact inter-arrival-gap deciles per event type (the
        |ingest-cadence profile beside q90's daily volume screen: a
        |collapsed p10 means bursty duplication, a blown p90 means a
        |stalled producer — and unlike mean/CV moments, order statistics
        |of epoch-microsecond gaps never overflow and never touch a
        |float). Gaps = consecutive same-type events by (ts, event_id);
        |deciles = the q104 integer rank arithmetic, value at
        |ceil(k·n/10). Scale shape — stated honestly: event TYPES are a
        |few large groups, so both the gap lag and the gap ranking are
        |per-type ordered passes (one task per type; DevScale reads 4×
        |wall at 10× rows for exactly this reason — unlike q100's
        |length table, microsecond gaps don't aggregate). The
        |production levers at real scale are SHIPPED as routing on
        |gapDeciles (the rfmSegments pattern): scalable=true (or
        |autoThreshold past a row count) partitions the lag by
        |(type, time-bucket) with exact boundary stitching — the gap
        |multiset is byte-identical, spec-pinned — and reads q72's
        |mergeable GK sketch for the quantile itself. This entry is the
        |exact ground truth that path is judged against.""".stripMargin,
      q107OracleSql) { (s, d) =>
      gapDeciles(Tables.events(s, d))
    },

    Q.cap("q107b_gap_deciles_scalable",
      """Q107b — the SCALE variant of q107, catalog-visible (VERDICT r11
        |item 1, the q20b precedent): the routed gapDeciles(scalable=true)
        |path — (type, time-bucket) partitioned lag with exact boundary
        |stitching (the gap MULTISET is byte-identical to the single
        |per-type window, CatalogSpec + StitchedGapsPropertySpec), then
        |q72's mergeable Greenwald–Khanna sketch for the decile itself
        |(map-side partials, no rank window; rank error ≤ n/accuracy,
        |exact-degenerate below `accuracy` gaps — at sf0.01's gap counts
        |the output equals exact q107 up to GK's own rank rounding).
        |No oracle by design: percentile_approx merge order is
        |partitioning-dependent, so the guarantee is the GK rank window,
        |not byte equality — CatalogSpec bounds it against exact q107;
        |this entry exists so the shipped routing gets a bench row and a
        |per-round regression guard. PlanShapeSpec pins no-rank-window +
        |objHashAggregate partials.""".stripMargin) { (s, d) =>
      gapDeciles(Tables.events(s, d), scalable = true)
    },

    Q("q108_hour_profile",
      """Q108 — hour-of-day traffic shape per event type (the
        |seasonality read a volume monitor normalizes by before calling
        |q90-style anomalies: a type whose mass sits in 3 UTC hours is a
        |batch job, not user traffic). Hour = pure integer epoch-micros
        |arithmetic ((us div 3600·10⁶) mod 24 — no engine timezone or
        |date-truncation semantics in play, the q71/q90 rule), defined
        |on the epoch-nonnegative domain: pre-1970 rows are EXPLICITLY
        |filtered on both engines (truncating vs flooring division
        |would bin them differently, and a negative bucket would fall
        |off the grid while inflating totals). Shares in integer
        |half-up e4; every (type, hour) cell exists — the 24-row hour
        |grid explodes from the #types-row total table (map-only, no
        |literal×literal cross join). Scale shape: the stream reduces
        |ONCE to the ≤ #types×24-row count table; everything after is
        |grid-sized.""".stripMargin,
      q108OracleSql) { (s, d) =>
      hourProfile(Tables.events(s, d))
    },

    Q("q109_lang_mix",
      """Q109 — per-source language composition (the mixture table q65's
        |temperature weighting and q38's langid QA read against: which
        |languages a source actually contributes, by document and token
        |mass, with the within-source share). Shares in integer half-up
        |e4 over exact counts; token mass = whitespace tokens (the
        |corpus-wide token accounting convention). Scale shape: ONE
        |reduction to the (source, lang) table (map-side combined, the
        |per-doc token count computed inside the scan projection); the
        |share window rides the tiny aggregate. At 100 TB: one scan, one
        |bounded exchange.""".stripMargin,
      q109OracleSql) { (s, d) =>
      langMix(Tables.documents(s, d))
    },

    Q("q110_value_percentiles",
      """Q110 — EXACT p50/p90/p99 of event value per type — the
        |ground-truth companion the q72 sketch quantiles are judged
        |against (same surface, opposite contract: q72 is bounded-memory
        |mergeable with rank error ≤ n/accuracy; this is the exact order
        |statistic at ceil(p·n/100)). The selected DOUBLE passes through
        |UNTOUCHED (no arithmetic — both engines surface the identical
        |parquet double, the q97 rule; ranks are integer, and ties on
        |value leave the rank-k VALUE deterministic). Scale shape —
        |stated honestly: exact selection over a few large type groups
        |is a per-type ordered pass (one task per type; continuous
        |doubles don't aggregate the way q100's lengths do — DevScale
        |6× at 10× rows). That is PRECISELY the contract q72's
        |Greenwald–Khanna sketch exists to break, and the routing is
        |SHIPPED on valuePercentiles (the rfmSegments pattern):
        |approx=true (or autoThreshold past a row count) reads the
        |mergeable GK sketch — map-side partials, no rank window. This
        |entry is the exact ground truth it is judged against (and the
        |audit-scale / sampled-slice read). Nulls are filtered
        |identically on both engines before ranking.""".stripMargin,
      q110OracleSql) { (s, d) =>
      valuePercentiles(Tables.events(s, d))
    },

    Q.cap("q110b_value_percentiles_approx",
      """Q110b — the SCALE variant of q110, catalog-visible (VERDICT r11
        |item 1, the q20b precedent): the routed
        |valuePercentiles(approx=true) path — q72's mergeable
        |Greenwald–Khanna sketch replaces the per-type ordered pass
        |entirely (map-side partials, no rank window; rank error ≤
        |n/accuracy, exact-degenerate below `accuracy` rows per type).
        |No oracle by design: the sketch's merge order is
        |partitioning-dependent, so the guarantee is the GK rank window
        |vs exact q110 (CatalogSpec), not byte equality; this entry
        |exists so the shipped routing gets a bench row and a per-round
        |regression guard. PlanShapeSpec pins the no-Window plan.""".stripMargin) { (s, d) =>
      valuePercentiles(Tables.events(s, d), approx = true)
    },

    Q("q114_stickiness",
      """Q114 — per-type DAU/WAU stickiness: for each (event type,
        |epoch day) the distinct daily actives, the distinct weekly
        |actives of the enclosing epoch week (day div 7 — deterministic
        |integer weeks, no ISO-calendar cross-engine hazard) and the
        |DAU/WAU ratio in half-up e4 — the engagement-intensity read
        |next to q71's retention matrix (retention says who RETURNS
        |across weeks, stickiness says how much of a week's audience
        |shows up on a given day). A user-grain type overlap was
        |prototyped and DROPPED — every user reaches all 5 types on
        |this corpus (the q98 degeneracy, measured first); stickiness
        |stays non-degenerate (0.29–0.52 across both SFs). Scale shape:
        |ONE full-data exchange into the distinct (type, user, day)
        |pre-reduction (the q113 grain); DAU re-reduces it to (type,
        |day), WAU re-keys the reduced frame to (type, user, week)
        |then (type, week); the final join runs on two calendar-bounded
        |tiny tables. Pre-1970 rows guarded out (the q108 rule).
        |""".stripMargin,
      q114OracleSql) { (s, d) =>
      stickiness(Tables.events(s, d))
    },

    Q("q115_conversion_lag",
      """Q115 — first-view → first-purchase conversion-lag histogram in
        |whole days (the funnel-velocity read next to q46's depth counts:
        |not HOW MANY convert but HOW LONG conversion takes). A user
        |converts iff they have both a view and a purchase and their
        |FIRST purchase is at or after their FIRST view (purchase-only
        |users and purchase-before-any-view users are excluded — the
        |lag would be negative attribution, pinned in the spec);
        |lag = (first_purchase_µs − first_view_µs) div 86400e6, exact
        |integer micros so the day bucket never floats (non-negative by
        |the filter, so truncating div ≡ floor on both engines). Scale
        |shape: ONE user exchange with the min-per-type conditional
        |aggregates map-side combined; the histogram is a ≤ span-days
        |reduction of the #users frame.""".stripMargin,
      q115OracleSql) { (s, d) =>
      conversionLag(Tables.events(s, d))
    },

    Q("q122_length_mad",
      """Q122 — per-source robust length screen: median, MAD (median
        |absolute deviation) and the count of docs with
        ||len − median| > 3·MAD — the outlier read a mean/stddev screen
        |(q52/q90's moment regime) gets WRONG on heavy-tailed length
        |distributions, because the outliers it hunts inflate the very
        |stddev that defines them; MAD is breakdown-50 % robust and, on
        |integer lengths, EXACT (both medians are integer order
        |statistics at rank ceil(n/2), the q110 convention — no float
        |enters). MAD = 0 degenerates deterministically (every
        |non-median length flags). Scale shape: the first median runs
        |on the shared lenCum (source, len) count table; the deviation
        |table derives from that SAME reduced table (|len − med| with
        |counts — the corpus is never re-scanned and no row-grain rank
        |window ever sorts a source slice); the second median and the
        |outlier count ride the re-reduced (source, |dev|) table.
        |""".stripMargin,
      q122OracleSql) { (s, d) =>
      lengthMad(Tables.documents(s, d))
    },

    Q("q124_hour_burst",
      """Q124 — per-type hourly burst ratio: max hourly event count vs
        |MEDIAN hourly count (half-up e4) over the observed absolute
        |hours — the spike screen at the grain q90's daily z-score
        |smooths over (a 1-hour 10× burst vanishes inside a normal
        |day; ops incident response reads hours). Median over OBSERVED
        |hours only (zero-event hours are absence, not data — the
        |q109 observed-rows convention); exact integers end to end
        |(median = rank ceil(n/2) on the counts-of-counts table).
        |Scale shape: ONE reduction to the (type, hour) table (map-side
        |combined, calendar-bounded rows); the median runs on the
        |re-reduced (type, count, k) counts-of-counts table — no hour
        |row-sort; max/n ride the same tiny frames. Pre-1970 guard
        |(the q108 rule).""".stripMargin,
      q124OracleSql) { (s, d) =>
      hourBurst(Tables.events(s, d))
    },

    Q("q125_token_entropy",
      """Q125 — per-source unigram token entropy and its normalized form
        |H / ln(n_types) — the distribution-CONCENTRATION screen beside
        |q70's TTR (which counts the support) and q59's JSD (which
        |compares shapes pairwise): a source whose token mass collapses
        |onto a few types (templated boilerplate, navigation chrome)
        |reads low entropy even when its raw vocabulary looks healthy.
        |H folds to ln(N) − (Σ c·ln c)/N so only the (source, token,
        |count) support rows carry float terms — no per-row probability
        |is ever materialized, and c·ln c of EXACT integer counts is the
        |same IEEE double on both engines (the q59 ln regime; the sum
        |rounds once at 4 dp). A single-type source normalizes to 0 by
        |convention on both engines (ln 1 = 0 in the denominator).
        |Scale shape: per-doc token counts come from the one-pass
        |tokenCounts kernel inside the scan projection (the q45 lesson —
        |token INSTANCES never shuffle; the wide exchange carries
        |pre-reduced (source, token, tf) partials with map-side
        |combine); the per-source rollup reduces the vocabulary-sized
        |support table to #sources rows and nothing vocabulary-sized is
        |broadcast or collected.""".stripMargin,
      """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS t
        |             FROM documents),
        |tc AS (SELECT source, t, count(*) AS c FROM tok GROUP BY 1, 2),
        |st AS (SELECT source, sum(c) AS n_tokens, count(*) AS n_types,
        |              sum(c * ln(c)) AS clnc
        |       FROM tc GROUP BY source)
        |SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
        |       CAST(n_types AS BIGINT) AS n_types,
        |       round(ln(n_tokens) - clnc / n_tokens, 4) AS entropy,
        |       CASE WHEN n_types = 1 THEN 0.0
        |            ELSE round((ln(n_tokens) - clnc / n_tokens) / ln(n_types), 4)
        |       END AS norm_entropy
        |FROM st ORDER BY source""".stripMargin) { (s, d) =>
      tokenEntropy(Tables.documents(s, d))
    },

    Q("q129_zipf_slope",
      """Q129 — per-source Zipf rank-frequency slope: OLS fit of ln(count)
        |on ln(rank) over the source's token distribution (rank by count
        |DESC, token ASC — a total order, so both engines rank
        |identically), with the fit's R² — the DISTRIBUTION-SHAPE screen
        |beside q125's entropy (which measures concentration but not
        |form): natural text tracks Zipf (slope ≈ −1, high R²); templated
        |or synthetic text flattens the curve (slope → 0) or breaks the
        |power-law fit (low R²), both machine-checkable gates before a
        |source enters the mixture. Float terms are ln of EXACT integers
        |(the q59/q125 ln regime) and the OLS moments round once at 4 dp;
        |the two degenerate fits guard on INTEGER conditions (n_types = 1,
        |or min count = max count — the all-tied distribution whose
        |float numerator is an order-dependent ~1e−14 that could round to
        |−0.0 on one engine) and read 0.0 by convention on both engines.
        |Scale shape: per-doc token counts come from the one-pass
        |tokenCounts kernel inside the scan projection (token INSTANCES
        |never shuffle — the q45/q125 lesson); ranks ride a row_number
        |over the REDUCED (source, token, count) support table (vocab
        |cardinality, the q59 grain — never corpus rows), and the five
        |OLS moments reduce that table to #sources rows with map-side
        |combine.""".stripMargin,
      """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS t
        |             FROM documents),
        |tc AS (SELECT source, t, count(*) AS c FROM tok GROUP BY 1, 2),
        |r AS (SELECT source, t, c,
        |        row_number() OVER (PARTITION BY source ORDER BY c DESC, t ASC) AS rnk
        |      FROM tc),
        |m AS (SELECT source, count(*) AS n, min(c) AS cmin, max(c) AS cmax,
        |        sum(ln(rnk)) AS sx, sum(ln(c)) AS sy,
        |        sum(ln(rnk) * ln(c)) AS sxy, sum(ln(rnk) * ln(rnk)) AS sxx,
        |        sum(ln(c) * ln(c)) AS syy
        |      FROM r GROUP BY source)
        |SELECT source, CAST(n AS BIGINT) AS n_types,
        |  CASE WHEN n = 1 OR cmin = cmax THEN 0.0
        |       ELSE round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4)
        |       END AS zipf_slope,
        |  CASE WHEN n = 1 OR cmin = cmax THEN 0.0
        |       ELSE round((n * sxy - sx * sy) * (n * sxy - sx * sy)
        |            / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 4)
        |       END AS r2
        |FROM m ORDER BY source""".stripMargin) { (s, d) =>
      zipfSlope(Tables.documents(s, d))
    },

    Q("q133_skipgram_pmi",
      """Q133 — windowed (skip-gram) collocations: top-20 UNORDERED token
        |pairs co-occurring within 4 positions, by PMI with min support 5
        |— the word2vec/GloVe-style context-pair signal beside q49's
        |ADJACENT bigrams: phrase structure lives at distance 1, topical
        |association lives across the window (the pair list an embedding
        |or stop-phrase pipeline actually consumes), and the two entries
        |measurably disagree on this corpus. Pairs normalize by
        |(least, greatest) so each forward co-occurrence counts once;
        |PMI = ln((c/t_p)/((c1/t_u)(c2/t_u))) of exact integer counts
        |(the q49/q59 ln regime), ranked on the rounded value with a
        |(w1, w2) tie-break so the top-20 cut is engine-stable. Scale
        |shape: extraction is NARROW — the token array zips with its own
        |d-shifted tail for d = 1..4 and the four zip arrays concat
        |per row (window× the token stream, no positional self-join —
        |the oracle's ix⋈ix formulation is exactly what the engine
        |avoids); pair and unigram counts are map-side-combined keyed
        |shuffles; totals ride a 1-row broadcast; the cut is a bounded
        |TakeOrdered, never a global sort.""".stripMargin,
      """WITH tok AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
        |ix AS (SELECT doc_id, unnest(toks) AS t, generate_subscripts(toks, 1) AS i
        |       FROM tok),
        |pr AS (SELECT least(a.t, b.t) AS w1, greatest(a.t, b.t) AS w2
        |       FROM ix a JOIN ix b ON a.doc_id = b.doc_id
        |                          AND b.i > a.i AND b.i <= a.i + 4),
        |pc AS (SELECT w1, w2, count(*) AS c_xy FROM pr GROUP BY 1, 2),
        |uc AS (SELECT t AS w, count(*) AS c_w FROM ix GROUP BY 1),
        |tot AS (SELECT (SELECT count(*) FROM pr) AS t_p,
        |               (SELECT count(*) FROM ix) AS t_u)
        |SELECT w1, w2, CAST(c_xy AS BIGINT) AS c_xy,
        |       round(ln((c_xy * 1.0 / t_p) /
        |                ((u1.c_w * 1.0 / t_u) * (u2.c_w * 1.0 / t_u))), 4) AS pmi
        |FROM pc JOIN uc u1 ON pc.w1 = u1.w JOIN uc u2 ON pc.w2 = u2.w CROSS JOIN tot
        |WHERE c_xy >= 5
        |ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin) { (s, d) =>
      skipgramPmi(Tables.documents(s, d))
    }
  )

  // lazy: declared below `qs`, which captures it during object init (the
  // Curation oracle-val convention — a plain val here is null at capture)
  /** q97's logic over an arbitrary event frame — exposed so specs can pin
    * the within-day tie order, the forward fill across event-less days,
    * and the no-future-leakage property on engineered streams.
    */
  def pitFeatures(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val e = events
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        col("event_id"), col("value"))
    // last-within-day via a max_by hash AGGREGATE on struct(us,
    // event_id) — (us, event_id) is a total order (event_id unique), so
    // this is deterministically the row_number()-window row, but
    // map-side COMBINABLE: only (user, day)-grain partials shuffle and
    // nothing event-grain is ever sorted (r13, DevQ97 — the shipped
    // window form full-sorted the event stream on its exchange; the
    // q57 agg-beats-sort lesson at the day grain). The reduced frame
    // is consumed three ways (grid min, horizon, join probe) — persist
    // the (user, day)-grain result, calendar-bounded, NOT the event
    // stream (session clearCache contract releases it).
    val lastPerDay = e.groupBy("user_id", "day")
      .agg(max_by(col("value"), struct(col("us"), col("event_id")))
        .as("value"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // grid = each user's first-event day through the corpus horizon —
    // the horizon is a PROVEN-1-row scalar (the q48/q65 cross-join
    // pattern), so no non-scalar nested loop; rows before a user's
    // first event never exist, which IS the no-backward-leakage rule.
    // Both bounds derive from the REDUCED table (min/max day over
    // (user, day) rows ≡ over raw events).
    val grid = lastPerDay.groupBy("user_id").agg(min(col("day")).as("mn"))
      .crossJoin(broadcast(lastPerDay.agg(max(col("day")).as("mx"))))
      .select(col("user_id"),
        explode(sequence(col("mn"), col("mx"))).as("day"))
    val fill = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(lastPerDay, Seq("user_id", "day"), "left")
      .withColumn("last_val", last(col("value"), ignoreNulls = true).over(fill))
      .filter(col("last_val").isNotNull)
      .select(col("user_id"), col("day"), col("last_val"))
      .orderBy("user_id", "day")
  }

  private lazy val q97OracleSql: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS us,
      |        CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day, event_id, value FROM events),
      |l AS (SELECT user_id, day, value FROM (
      |   SELECT user_id, day, value,
      |          row_number() OVER (PARTITION BY user_id, day ORDER BY us DESC, event_id DESC) AS rn
      |   FROM e) WHERE rn = 1),
      |b AS (SELECT user_id, min(day) AS mn FROM e GROUP BY 1),
      |mx AS (SELECT max(day) AS mx FROM e),
      |grid AS (SELECT user_id, unnest(generate_series(mn, mx.mx)) AS day
      |         FROM b CROSS JOIN mx),
      |f AS (SELECT g.user_id, g.day,
      |      last_value(l.value IGNORE NULLS) OVER (PARTITION BY g.user_id ORDER BY g.day) AS last_val
      |      FROM grid g LEFT JOIN l ON l.user_id = g.user_id AND l.day = g.day)
      |SELECT user_id, day, last_val FROM f WHERE last_val IS NOT NULL
      |ORDER BY user_id, day""".stripMargin

  private lazy val q87OracleSql: String =
    """WITH x AS (SELECT user_id, event_type, epoch_us(ts) AS us,
        |   lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt,
        |   lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nus
        |   FROM events),
        |t AS (SELECT event_type AS src_type, nxt AS dst_type FROM x
        |   WHERE nxt IS NOT NULL AND nus - us <= 1800000000),
        |c AS (SELECT src_type, dst_type, count(*) AS n FROM t GROUP BY 1, 2)
        |SELECT src_type, dst_type, CAST(n AS BIGINT) AS n,
        |  CAST((2 * 10000 * n + s) // (2 * s) AS BIGINT) AS p_e4
        |FROM (SELECT *, sum(n) OVER (PARTITION BY src_type) AS s FROM c)
        |ORDER BY src_type, dst_type""".stripMargin

  /** q98's logic over an arbitrary event frame — exposed so specs can pin
    * the session boundary (strictly-greater gap breaks; an exactly-gapUs
    * gap stays), within-session type dedup, and the hand-computed
    * support/lift arithmetic on engineered streams.
    */
  /** The q30-gap sessionize → per-session sorted distinct-type set, the
    * shared base of q98 (itemsets) and q111 (rules): the sessionize
    * window and the (user, sid) reduction ride ONE user exchange
    * (HashPartitioning(user_id) satisfies the clustering — the q57
    * lesson); per-session state is the bounded distinct type set.
    * PERSISTED — callers consume it multiple ways (session clearCache
    * contract).
    */
  private def sessionTypeSets(events: org.apache.spark.sql.DataFrame,
                              gapUs: Long): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev", lag(col("us"), 1).over(w))
      .withColumn("brk",
        when(col("prev").isNull || col("us") - col("prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("brk"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(sort_array(collect_set(col("event_type"))).as("tys"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  def sessionItemsets(events: org.apache.spark.sql.DataFrame,
                      gapUs: Long = 1800000000L): org.apache.spark.sql.DataFrame = {
    val sess = sessionTypeSets(events, gapUs)
    val ns = sess.agg(count(lit(1)).as("ns")) // proven 1-row scalar
    val ta = sess.select(explode(col("tys")).as("event_type"))
      .groupBy("event_type").agg(count(lit(1)).as("na"))
    // pairs expand locally from the sorted ≤#types array — u > t gives
    // each unordered pair once, already (a < b)-canonical
    val pr = sess
      .select(explode(expr(typePairsExpr)).as("p"))
      .select(col("p.type_a").as("type_a"), col("p.type_b").as("type_b"))
      .groupBy("type_a", "type_b").agg(count(lit(1)).as("n_ab"))
    pr.crossJoin(ns)
      .join(broadcast(ta.select(col("event_type").as("type_a"),
        col("na").as("na_a"))), Seq("type_a"))
      .join(broadcast(ta.select(col("event_type").as("type_b"),
        col("na").as("na_b"))), Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("n_ab"),
        expr("(2 * 10000 * n_ab + ns) div (2 * ns)").as("support_e4"),
        expr("(2 * 10000 * ns * n_ab + na_a * na_b) div (2 * na_a * na_b)")
          .as("lift_e4"))
      .transform(Relational.smallSort(_, "type_a", "type_b"))
  }

  /** Pair expansion over a sorted distinct-type array column named
    * `tys`: each unordered pair exactly once, (a < b)-canonical. The ONE
    * definition shared by batch q98 and the streaming basket rollup
    * (`Streams.basketPairCounts`) — the two must expand identically for
    * the live co-occurrence table to be the q98 read.
    */
  private[graft] val typePairsExpr: String =
    "flatten(transform(tys, t -> transform(filter(tys, u -> u > t), " +
      "u -> named_struct('type_a', t, 'type_b', u))))"

  /** q113's logic over an arbitrary event frame — exposed so specs can
    * pin the cut selection, the per-side masses and the straddler rule
    * on engineered streams.
    */
  def timeSplit(events: org.apache.spark.sql.DataFrame,
                pctTrain: Int = 80): org.apache.spark.sql.DataFrame = {
    // ONE full-data exchange: the (type, user, day) pre-reduction serves
    // both downstream grains — (type, day) masses re-reduce it and the
    // straddler min/max re-keys it — so raw events shuffle exactly once
    // and the persisted frame is the reduced table, never the projection
    // (session clearCache contract)
    val ug = events.filter(expr(tsNonNegExpr))
      .select(col("event_type"), col("user_id"),
        expr(epochDayExpr).as("day"))
      .groupBy("event_type", "user_id", "day").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val c = ug.groupBy("event_type", "day").agg(sum(col("c")).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the day CDF lives on the #days-row (calendar-bounded) day table —
    // ONE collected sorted array in a proven-1-row frame, the cut found
    // by a linear aggregate() scan (no window, no grid, no explode)
    val cut = c.groupBy("day").agg(sum(col("c")).as("dc"))
      .agg(sort_array(collect_list(struct(col("day"), col("dc"))))
        .as("arr")) // proven 1-row
      .withColumn("thr",
        expr(s"($pctTrain * aggregate(arr, 0L, (a, x) -> a + x.dc) + 99) div 100"))
      .select(expr(
        """aggregate(arr, named_struct('cum', 0L, 'cut', CAST(NULL AS BIGINT)),
          |  (acc, x) -> IF(acc.cut IS NOT NULL, acc,
          |    named_struct('cum', acc.cum + x.dc,
          |      'cut', IF(acc.cum + x.dc >= thr, x.day, CAST(NULL AS BIGINT)))),
          |  acc -> acc.cut)""".stripMargin).as("cut"))
    val tt = c.crossJoin(cut).groupBy("event_type")
      .agg(sum(when(col("day") <= col("cut"), col("c")).otherwise(0L))
        .as("n_train"),
        sum(when(col("day") > col("cut"), col("c")).otherwise(0L))
          .as("n_test"))
    val su = ug.groupBy("event_type", "user_id")
      .agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
    val st = su.crossJoin(cut)
      .filter(col("mn") <= col("cut") && col("mx") > col("cut"))
      .groupBy("event_type").agg(count(lit(1)).as("n_straddlers"))
    tt.join(st, Seq("event_type"), "left")
      .select(col("event_type"), col("n_train"), col("n_test"),
        expr("(2 * 10000 * n_test + (n_train + n_test)) div (2 * (n_train + n_test))")
          .as("test_share_e4"),
        coalesce(col("n_straddlers"), lit(0L)).as("n_straddlers"))
      .transform(Relational.smallSort(_, "event_type"))
  }

  private lazy val q113OracleSql: String =
    """WITH e AS (SELECT event_type, user_id, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
      |           FROM events WHERE epoch_us(ts) >= 0),
      |c AS (SELECT event_type, day, count(*) AS c FROM e GROUP BY 1, 2),
      |days AS (SELECT day FROM c GROUP BY day),
      |types AS (SELECT event_type FROM c GROUP BY event_type),
      |grid AS (SELECT t.event_type AS event_type, d.day AS day FROM types t CROSS JOIN days d),
      |cs AS (SELECT g.event_type AS event_type, g.day AS day,
      |       sum(coalesce(c.c, 0)) OVER (PARTITION BY g.event_type ORDER BY g.day) AS cum
      |       FROM grid g LEFT JOIN c ON c.event_type = g.event_type AND c.day = g.day),
      |gc AS (SELECT day, sum(cum) AS gcum FROM cs GROUP BY day),
      |n AS (SELECT sum(c) AS n FROM c),
      |cut AS (SELECT min(day) AS cut FROM gc, n WHERE gcum >= (80 * n.n + 99) // 100),
      |tt AS (SELECT c.event_type,
      |       sum(CASE WHEN c.day <= cut.cut THEN c.c ELSE 0 END) AS n_train,
      |       sum(CASE WHEN c.day > cut.cut THEN c.c ELSE 0 END) AS n_test
      |       FROM c, cut GROUP BY 1),
      |su AS (SELECT e.event_type, e.user_id, min(day) AS mn, max(day) AS mx
      |       FROM e GROUP BY 1, 2),
      |st AS (SELECT su.event_type, count(*) AS n_straddlers
      |       FROM su, cut WHERE mn <= cut.cut AND mx > cut.cut GROUP BY 1)
      |SELECT tt.event_type AS event_type, CAST(n_train AS BIGINT) AS n_train,
      |  CAST(n_test AS BIGINT) AS n_test,
      |  CAST((2 * 10000 * n_test + (n_train + n_test)) // (2 * (n_train + n_test)) AS BIGINT) AS test_share_e4,
      |  CAST(coalesce(st.n_straddlers, 0) AS BIGINT) AS n_straddlers
      |FROM tt LEFT JOIN st ON st.event_type = tt.event_type
      |ORDER BY event_type""".stripMargin

  /** q114's logic over an arbitrary event frame — exposed so specs can
    * pin the distinct grains and the e4 ratio on engineered streams.
    */
  def stickiness(events: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    // ONE full-data exchange into the distinct (type, user, day)
    // pre-reduction; both the DAU and WAU grains re-reduce it →
    // persist (session clearCache contract)
    val ud = events.filter(expr(tsNonNegExpr))
      .select(col("event_type"), col("user_id"),
        expr(epochDayExpr).as("day"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dau = ud.groupBy("event_type", "day").agg(count(lit(1)).as("dau"))
    val wau = ud.select(col("event_type"), col("user_id"),
        expr("day div 7").as("wk")).distinct()
      .groupBy("event_type", "wk").agg(count(lit(1)).as("wau"))
      .select(col("event_type").as("et"), col("wk"), col("wau"))
    dau.join(wau, col("et") === col("event_type") &&
        col("wk") === expr("day div 7"))
      .select(col("event_type"), col("day"), col("dau"), col("wau"),
        expr("(2 * 10000 * dau + wau) div (2 * wau)").as("stickiness_e4"))
      .transform(Relational.smallSort(_, "event_type", "day"))
  }

  private lazy val q114OracleSql: String =
    """WITH ud AS (SELECT DISTINCT event_type, user_id,
      |    CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
      |    FROM events WHERE epoch_us(ts) >= 0),
      |dau AS (SELECT event_type, day, count(*) AS dau FROM ud GROUP BY 1, 2),
      |uw AS (SELECT DISTINCT event_type, user_id, day // 7 AS wk FROM ud),
      |wau AS (SELECT event_type, wk, count(*) AS wau FROM uw GROUP BY 1, 2)
      |SELECT dau.event_type AS event_type, dau.day AS day,
      |  CAST(dau.dau AS BIGINT) AS dau, CAST(wau.wau AS BIGINT) AS wau,
      |  CAST((2 * 10000 * dau.dau + wau.wau) // (2 * wau.wau) AS BIGINT)
      |    AS stickiness_e4
      |FROM dau JOIN wau ON wau.event_type = dau.event_type
      |  AND wau.wk = dau.day // 7
      |ORDER BY event_type, day""".stripMargin

  /** q115's logic over an arbitrary event frame — exposed so specs can
    * pin the conversion rule's boundaries (inclusive same-instant
    * conversion, purchase-before-view and purchase-only exclusion) on
    * engineered streams.
    */
  def conversionLag(events: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    events
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "view", expr("unix_micros(ts)")))
          .as("v"),
        min(when(col("event_type") === "purchase", expr("unix_micros(ts)")))
          .as("p"))
      .filter(col("v").isNotNull && col("p").isNotNull && col("p") >= col("v"))
      .select(expr("(p - v) div 86400000000").as("lag_days"))
      .groupBy("lag_days").agg(count(lit(1)).as("n_users"))
      .transform(Relational.smallSort(_, "lag_days"))

  private lazy val q115OracleSql: String =
    """WITH u AS (SELECT user_id,
      |    min(epoch_us(ts)) FILTER (event_type = 'view') AS v,
      |    min(epoch_us(ts)) FILTER (event_type = 'purchase') AS p
      |    FROM events WHERE event_type IN ('view', 'purchase') GROUP BY 1)
      |SELECT (p - v) // 86400000000 AS lag_days, count(*) AS n_users
      |FROM u WHERE v IS NOT NULL AND p IS NOT NULL AND p >= v
      |GROUP BY 1 ORDER BY lag_days""".stripMargin

  /** q122's logic over an arbitrary document frame — exposed so specs
    * can pin both median ranks, the deviation-from-reduced-table shape
    * and the MAD = 0 degenerate rule on engineered corpora.
    */
  def lengthMad(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    // the (source, len) count table feeds the median mark AND the
    // deviation derivation → persist (session clearCache contract)
    val c = lenCum(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val med = c.filter(col("cum") >= expr("(n + 1) div 2"))
      .groupBy("source")
      .agg(min(col("len")).as("med"), max(col("n")).as("n_docs"))
    // deviations derive from the REDUCED table: (source, |len − med|)
    // with the counts carried — the corpus is never re-scanned
    val d = c.join(broadcast(med), Seq("source"))
      .select(col("source"), abs(col("len") - col("med")).as("a"),
        col("c"))
      .groupBy("source", "a").agg(sum(col("c")).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wd = Window.partitionBy("source")
    val mad = d
      .withColumn("cum", sum(col("c")).over(wd.orderBy("a")))
      .withColumn("nn", sum(col("c")).over(wd))
      .filter(col("cum") >= expr("(nn + 1) div 2"))
      .groupBy("source").agg(min(col("a")).as("mad"))
    val outl = d.join(broadcast(mad), Seq("source"))
      .groupBy("source")
      .agg(sum(when(col("a") > lit(3) * col("mad"), col("c"))
        .otherwise(0L)).as("n_outliers"))
    med.join(mad, Seq("source")).join(outl, Seq("source"))
      .select(col("source"), col("n_docs"), col("med").as("med_len"),
        col("mad"), col("n_outliers"))
      .transform(Relational.smallSort(_, "source"))
  }

  private lazy val q122OracleSql: String =
    """WITH l AS (SELECT source, n_chars AS len FROM documents),
      |c AS (SELECT source, len, count(*) AS c FROM l GROUP BY 1, 2),
      |cs AS (SELECT source, len, c, sum(c) OVER (PARTITION BY source ORDER BY len) AS cum,
      |       sum(c) OVER (PARTITION BY source) AS n FROM c),
      |med AS (SELECT source, min(len) AS med, max(n) AS n_docs
      |        FROM cs WHERE cum >= (n + 1) // 2 GROUP BY 1),
      |d AS (SELECT c.source, abs(c.len - med.med) AS a, sum(c.c) AS c
      |      FROM c JOIN med USING (source) GROUP BY 1, 2),
      |ds AS (SELECT source, a, c, sum(c) OVER (PARTITION BY source ORDER BY a) AS cum,
      |       sum(c) OVER (PARTITION BY source) AS nn FROM d),
      |mad AS (SELECT source, min(a) AS mad FROM ds WHERE cum >= (nn + 1) // 2 GROUP BY 1),
      |outl AS (SELECT d.source, sum(CASE WHEN d.a > 3 * mad.mad THEN d.c ELSE 0 END) AS n_out
      |         FROM d JOIN mad USING (source) GROUP BY 1)
      |SELECT med.source AS source, CAST(med.n_docs AS BIGINT) AS n_docs,
      |  CAST(med.med AS BIGINT) AS med_len, CAST(mad.mad AS BIGINT) AS mad,
      |  CAST(outl.n_out AS BIGINT) AS n_outliers
      |FROM med JOIN mad USING (source) JOIN outl USING (source)
      |ORDER BY source""".stripMargin

  /** q124's logic over an arbitrary event frame — exposed so specs can
    * pin the counts-of-counts median rank and the burst arithmetic on
    * engineered streams.
    */
  def hourBurst(events: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    // ONE full-data reduction to the calendar-bounded (type, hour)
    // table; it feeds the counts-of-counts median AND the max/n rollup
    // → persist (session clearCache contract)
    val h = events.filter(expr(tsNonNegExpr))
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("hr"))
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cc = h.groupBy("event_type", "c").agg(count(lit(1)).as("k"))
    val wt = Window.partitionBy("event_type")
    val med = cc
      .withColumn("cum", sum(col("k")).over(wt.orderBy("c")))
      .withColumn("n", sum(col("k")).over(wt))
      .filter(col("cum") >= expr("(n + 1) div 2"))
      .groupBy("event_type").agg(min(col("c")).as("med"))
    val mx = h.groupBy("event_type")
      .agg(max(col("c")).as("mx"), count(lit(1)).as("n_hours"))
    mx.join(med, Seq("event_type"))
      .select(col("event_type"), col("n_hours"), col("med"), col("mx"),
        expr("(2 * 10000 * mx + med) div (2 * med)").as("burst_e4"))
      .transform(Relational.smallSort(_, "event_type"))
  }

  private lazy val q124OracleSql: String =
    """WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr, count(*) AS c
      |     FROM events WHERE epoch_us(ts) >= 0 GROUP BY 1, 2),
      |cc AS (SELECT event_type, c, count(*) AS k FROM h GROUP BY 1, 2),
      |cs AS (SELECT event_type, c, k, sum(k) OVER (PARTITION BY event_type ORDER BY c) AS cum,
      |       sum(k) OVER (PARTITION BY event_type) AS n FROM cc),
      |med AS (SELECT event_type, min(c) AS med FROM cs WHERE cum >= (n + 1) // 2 GROUP BY 1),
      |mx AS (SELECT event_type, max(c) AS mx, count(*) AS n_hours FROM h GROUP BY 1)
      |SELECT mx.event_type AS event_type, CAST(n_hours AS BIGINT) AS n_hours,
      |  CAST(med.med AS BIGINT) AS med, CAST(mx.mx AS BIGINT) AS mx,
      |  CAST((2 * 10000 * mx.mx + med.med) // (2 * med.med) AS BIGINT) AS burst_e4
      |FROM mx JOIN med USING (event_type) ORDER BY event_type""".stripMargin

  /** q111's logic over an arbitrary event frame — exposed so specs can
    * pin the asymmetric confidence against hand values on engineered
    * streams.
    */
  def sessionRules(events: org.apache.spark.sql.DataFrame,
                   gapUs: Long = 1800000000L): org.apache.spark.sql.DataFrame = {
    val sess = sessionTypeSets(events, gapUs)
    val ta = sess.select(explode(col("tys")).as("event_type"))
      .groupBy("event_type").agg(count(lit(1)).as("na"))
    val pr = sess
      .select(explode(expr(
        "flatten(transform(tys, t -> transform(filter(tys, u -> u != t), " +
          "u -> named_struct('ante', t, 'cons', u))))")).as("p"))
      .select(col("p.ante").as("ante"), col("p.cons").as("cons"))
      .groupBy("ante", "cons").agg(count(lit(1)).as("n_both"))
    pr.join(broadcast(ta.select(col("event_type").as("ante"),
        col("na").as("n_ante"))), Seq("ante"))
      .select(col("ante"), col("cons"), col("n_ante"), col("n_both"),
        expr("(2 * 10000 * n_both + n_ante) div (2 * n_ante)").as("conf_e4"))
      .transform(Relational.smallSort(_, "ante", "cons"))
  }

  private lazy val q111OracleSql: String =
    """WITH x AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
      |    CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |         OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
      |         THEN 1 ELSE 0 END AS brk
      |    FROM events),
      |s AS (SELECT user_id, event_type,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM x),
      |st AS (SELECT DISTINCT user_id, sid, event_type FROM s),
      |ta AS (SELECT event_type, count(*) AS na FROM st GROUP BY 1),
      |pr AS (SELECT a.event_type AS ante, b.event_type AS cons, count(*) AS n_both
      |       FROM st a JOIN st b ON a.user_id = b.user_id AND a.sid = b.sid
      |        AND a.event_type <> b.event_type
      |       GROUP BY 1, 2)
      |SELECT ante, cons, CAST(ta.na AS BIGINT) AS n_ante, CAST(n_both AS BIGINT) AS n_both,
      |  CAST((2 * 10000 * n_both + ta.na) // (2 * ta.na) AS BIGINT) AS conf_e4
      |FROM pr JOIN ta ON ta.event_type = pr.ante
      |ORDER BY ante, cons""".stripMargin

  private lazy val q98OracleSql: String =
    """WITH x AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
      |    CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |         OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
      |         THEN 1 ELSE 0 END AS brk
      |    FROM events),
      |s AS (SELECT user_id, event_type,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM x),
      |st AS (SELECT DISTINCT user_id, sid, event_type FROM s),
      |ns AS (SELECT count(*) AS n FROM (SELECT DISTINCT user_id, sid FROM st)),
      |ta AS (SELECT event_type, count(*) AS na FROM st GROUP BY 1),
      |pr AS (SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_ab
      |       FROM st a JOIN st b ON a.user_id = b.user_id AND a.sid = b.sid
      |        AND a.event_type < b.event_type
      |       GROUP BY 1, 2)
      |SELECT type_a, type_b, CAST(n_ab AS BIGINT) AS n_ab,
      |  CAST((2 * 10000 * n_ab + ns.n) // (2 * ns.n) AS BIGINT) AS support_e4,
      |  CAST((2 * 10000 * ns.n * n_ab + ta.na * tb.na) // (2 * ta.na * tb.na) AS BIGINT) AS lift_e4
      |FROM pr, ns
      |JOIN ta ON ta.event_type = pr.type_a
      |JOIN ta tb ON tb.event_type = pr.type_b
      |ORDER BY type_a, type_b""".stripMargin

  /** q99's logic over an arbitrary document frame — exposed so specs can
    * pin the KS arithmetic against a driver-side replay, the
    * identical-distribution zero and the single-source guard.
    */
  def lengthKs(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // the (source, len) count table feeds four subtrees → persist
    // (session clearCache contract)
    val c = docs.groupBy(col("source"), col("n_chars").as("len"))
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val gl = c.select("len").distinct()
    val la = gl.agg(sort_array(collect_list(col("len"))).as("lens")) // 1-row
    val srcs = c.groupBy("source").agg(sum(col("c")).as("n_s"))
    val tot = c.agg(sum(col("c")).as("n")) // proven 1-row scalar
    val grid = srcs.crossJoin(la)
      .select(col("source"), col("n_s"), explode(col("lens")).as("len"))
    val cs = grid.join(c, Seq("source", "len"), "left")
      .withColumn("cum_s", sum(coalesce(col("c"), lit(0L)))
        .over(Window.partitionBy("source").orderBy("len")))
    // CDFs are additive: the global cumulative at each length is the sum
    // of the per-source cumulatives — a #sources-row window per length,
    // never a global window
    val wg = cs.withColumn("gcum",
      sum(col("cum_s")).over(Window.partitionBy("len")))
    wg.crossJoin(tot)
      .withColumn("num", abs(col("cum_s") * (col("n") - col("n_s")) -
        (col("gcum") - col("cum_s")) * col("n_s")))
      .groupBy("source", "n_s", "n").agg(max(col("num")).as("ks_num"))
      .filter(col("n") > col("n_s")) // a source needs a complement
      .select(col("source"), col("n_s").as("n_docs"),
        expr("(2 * 10000 * ks_num + n_s * (n - n_s)) div (2 * n_s * (n - n_s))")
          .as("ks_e4"))
      .transform(Relational.smallSort(_, "source"))
  }

  private lazy val q99OracleSql: String =
    """WITH c AS (SELECT source, n_chars AS len, count(*) AS c FROM documents GROUP BY 1, 2),
      |gl AS (SELECT len FROM c GROUP BY len),
      |srcs AS (SELECT source, sum(c) AS n_s FROM c GROUP BY 1),
      |tot AS (SELECT sum(c) AS n FROM c),
      |grid AS (SELECT s.source, s.n_s, g.len FROM srcs s CROSS JOIN gl g),
      |cs AS (SELECT g.source, g.n_s, g.len,
      |       sum(coalesce(c.c, 0)) OVER (PARTITION BY g.source ORDER BY g.len) AS cum_s
      |       FROM grid g LEFT JOIN c ON c.source = g.source AND c.len = g.len),
      |wg AS (SELECT *, sum(cum_s) OVER (PARTITION BY len) AS gcum FROM cs),
      |nm AS (SELECT source, n_s, any_value(tot.n) AS n,
      |       max(abs(cum_s * (tot.n - n_s) - (gcum - cum_s) * n_s)) AS ks_num
      |       FROM wg, tot GROUP BY 1, 2)
      |SELECT source, CAST(n_s AS BIGINT) AS n_docs,
      |  CAST((2 * 10000 * ks_num + n_s * (n - n_s)) // (2 * n_s * (n - n_s)) AS BIGINT) AS ks_e4
      |FROM nm WHERE n > n_s ORDER BY source""".stripMargin

  /** The shared (source, len, c, cum, n) cumulative-count table the
    * order-statistic queries (q100/q102/q104) build on: the corpus
    * reduces ONCE to per-(source, length) counts (map-side combined),
    * and every window below runs on that CARDINALITY-BOUNDED aggregate
    * — never a per-source sort of raw rows (a row-grain rank window
    * puts each source's whole corpus slice in one task at 100 TB; the
    * aggregate's size is bounded by the doc-size range). NOT persisted
    * here: q102/q104 consume it exactly once — only lengthClip reads
    * it twice and persists at its own call site (review finding,
    * session 4).
    */
  private def lenCum(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ws = Window.partitionBy("source")
    docs.groupBy(col("source"), col("n_chars").as("len"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(ws.orderBy("len")))
      .withColumn("n", sum(col("c")).over(ws))
  }

  /** q100's logic over an arbitrary document frame — exposed so specs can
    * pin the exact order-statistic rank, the tie behavior and the clip
    * accounting on engineered corpora. The output column keeps the name
    * `p90` (the catalog's pct = 90) whatever `pct` a spec passes.
    * The rank-k value on the cumulative table is min(len | cum ≥ k) —
    * identical to the row-grain order statistic, without its per-source
    * row sort.
    */
  def lengthClip(docs: org.apache.spark.sql.DataFrame,
                 pct: Int = 90): org.apache.spark.sql.DataFrame = {
    // the one lenCum caller that reads it twice (threshold + join back)
    // → persist here (session clearCache contract)
    val c = lenCum(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val th = c.filter(col("cum") >= expr(s"($pct * n + 99) div 100"))
      .groupBy("source").agg(min(col("len")).as("p90"), max(col("n")).as("n_docs"))
    c.join(broadcast(th), Seq("source"))
      .groupBy("source")
      .agg(max(col("n_docs")).as("n_docs"), max(col("p90")).as("p90"),
        sum(when(col("len") > col("p90"), col("c")).otherwise(0L))
          .as("n_clipped"),
        sum(when(col("len") > col("p90"), (col("len") - col("p90")) * col("c"))
          .otherwise(0L)).as("chars_saved"))
      .transform(Relational.smallSort(_, "source"))
  }

  /** q107's logic over an arbitrary event frame — exposed so specs can
    * pin the gap extraction (per-type lag by (ts, event_id)) and the
    * rank arithmetic on engineered streams.
    *
    * `scalable` is the 100 TB path the entry's doc declares (VERDICT r10
    * item 2, the rfmSegments routing pattern): the gap LAG is partitioned
    * by (type, time-bucket) with bucket boundaries stitched through the
    * bucket-grain aggregate — the gap MULTISET stays byte-exact (spec:
    * stitched ≡ single-window on engineered streams and the corpus)
    * while the per-type ordered pass shrinks from #events rows to
    * #buckets rows; the decile itself then comes from q72's mergeable
    * Greenwald–Khanna sketch (map-side partials, no rank window; rank
    * error ≤ n/accuracy — exact-degenerate below `accuracy` gaps). The
    * exact form (default, the oracled entry) is the ground truth the
    * scalable form is judged against.
    *
    * `autoThreshold` routes between them by event count — Some(t) takes
    * the scalable path iff #events > t. '''EAGER-ACTION WARNING''' (the
    * rfmSegments caveat): passing Some(t) runs a Spark `count()` action
    * at construction time.
    */
  def gapDeciles(events: org.apache.spark.sql.DataFrame,
                 scalable: Boolean = false,
                 autoThreshold: Option[Long] = None,
                 bucketUs: Long = 3600000000L,
                 accuracy: Int = 10000): org.apache.spark.sql.DataFrame = {
    val useScalable = scalable || autoThreshold.exists(t => events.count() > t)
    if (useScalable) {
      stitchedGaps(events, bucketUs)
        .groupBy("event_type")
        .agg(expr("percentile_approx(gap, " +
          "array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D), " +
          s"$accuracy)").as("qs"))
        .select(col("event_type"), posexplode(col("qs")).as(Seq("pos", "g")))
        .select(col("event_type"), (col("pos") + 1).cast(IntegerType).as("k"),
          col("g").cast(LongType).as("gap_us"))
        .transform(Relational.smallSort(_, "event_type", "k"))
    } else {
      val wl = Window.partitionBy("event_type").orderBy(col("us"), col("event_id"))
      val g = events
        .select(col("event_type"), unix_micros(col("ts")).as("us"),
          col("event_id"))
        .withColumn("gap", col("us") - lag(col("us"), 1).over(wl))
        .filter(col("gap").isNotNull)
      val wr = Window.partitionBy("event_type").orderBy("gap")
      g.withColumn("rn", row_number().over(wr))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
        .select(col("event_type"), col("gap"), col("rn"), col("n"),
          explode(sequence(lit(1), lit(9))).as("k"))
        .filter(col("rn") === expr("(k * n + 9) div 10"))
        .select(col("event_type"), col("k").cast(IntegerType).as("k"),
          col("gap").as("gap_us"))
        .transform(Relational.smallSort(_, "event_type", "k"))
    }
  }

  /** The (type, time-bucket) stitched gap extraction — EXACT: emits the
    * identical gap multiset as the single per-type window lag, but the
    * within-bucket lag distributes across (type, bucket) tasks and only
    * the BUCKET-GRAIN first/last table (one row per non-empty bucket)
    * rides a per-type ordered pass. Correctness argument: `us div
    * bucketUs` is monotone in us, so (bucket asc, (us, event_id) asc
    * within) is the global (us, event_id) order; each event's
    * predecessor is either within its bucket (the windowed lag) or the
    * last event of the previous NON-EMPTY bucket — which is exactly what
    * lag over the non-empty bucket aggregate yields (empty buckets have
    * no row to lag over, so they are skipped by construction, not by a
    * special case). Exposed package-private for the equivalence spec.
    */
  private[queries] def stitchedGaps(events: org.apache.spark.sql.DataFrame,
                                    bucketUs: Long)
      : org.apache.spark.sql.DataFrame = {
    // ONE corpus exchange: collect each (type, bucket)'s (us, event_id)
    // pairs, sort in-task (sort_array on the struct = the (us, event_id)
    // lexicographic tie rule), and compute the within-bucket gaps as a
    // higher-order transform over the sorted array — no window sort, no
    // second exchange for first/last (they're the array ends). Per-task
    // memory is bounded by bucket occupancy: bucketUs is the lever
    // (shrink it on hotter streams).
    val bkts = events
      .select(col("event_type"), unix_micros(col("ts")).as("us"),
        col("event_id"))
      .withColumn("bkt", expr(s"us div ${bucketUs}L"))
      .groupBy("event_type", "bkt")
      .agg(sort_array(collect_list(struct(col("us"), col("event_id"))))
        .as("arr"))
      .select(col("event_type"), col("bkt"),
        // zip_with over offset slices (NOT sequence(1, size-1): Spark's
        // sequence counts DOWN when stop < start, so a 1-element bucket
        // would index past the array)
        expr("zip_with(slice(arr, 2, size(arr) - 1), " +
          "slice(arr, 1, size(arr) - 1), (a, b) -> a.us - b.us)")
          .as("gaps"),
        expr("element_at(arr, 1).us").as("first_us"),
        expr("element_at(arr, size(arr)).us").as("last_us"))
    // bucket-grain stitch: each bucket's first event gaps to the previous
    // NON-EMPTY bucket's last event — lag over the bucket aggregate skips
    // empty buckets by construction (no row to lag over)
    val ws = Window.partitionBy("event_type").orderBy("bkt")
    bkts
      .withColumn("prev_last_us", lag(col("last_us"), 1).over(ws))
      .select(col("event_type"),
        explode(when(col("prev_last_us").isNotNull,
          concat(array(col("first_us") - col("prev_last_us")), col("gaps")))
          .otherwise(col("gaps"))).as("gap"))
  }

  private lazy val q107OracleSql: String =
    """WITH e AS (SELECT event_type, epoch_us(ts) AS us, event_id FROM events),
      |g AS (SELECT event_type, us - lag(us) OVER (PARTITION BY event_type ORDER BY us, event_id) AS gap FROM e),
      |r AS (SELECT event_type, gap, row_number() OVER (PARTITION BY event_type ORDER BY gap) AS rn,
      |      count(*) OVER (PARTITION BY event_type) AS n FROM g WHERE gap IS NOT NULL)
      |SELECT event_type, CAST(k AS INT) AS k, CAST(gap AS BIGINT) AS gap_us
      |FROM r CROSS JOIN (SELECT unnest(range(1, 10)) AS k)
      |WHERE rn = (k * n + 9) // 10 ORDER BY event_type, k""".stripMargin

  /** The q108 hour-of-day bucket over a `ts` column — the ONE
    * definition the batch profile and the streaming monitor
    * (`Streams.hourCounts`) share (the typePairsExpr convention).
    * Defined for the epoch-nonnegative domain: callers filter
    * `unix_micros(ts) >= 0` FIRST — pre-1970 micros bin differently
    * under Spark's truncating `div` and DuckDB's flooring `//`, and a
    * negative bucket would silently fall off the 0..23 grid while
    * inflating the totals (review finding, session 4).
    */
  private[graft] val hourOfDayExpr: String =
    "CAST((unix_micros(ts) div 3600000000) % 24 AS INT)"

  /** The pre-1970 guard + epoch-day bucket q113, q114 and the streaming
    * DAU monitor share (the hourOfDayExpr convention — ONE definition,
    * so the StreamingSpec batch≡stream equivalence stays structural:
    * an edit to the guard or the bucket cannot drift one consumer).
    */
  private[graft] val tsNonNegExpr: String = "unix_micros(ts) >= 0"
  private[graft] val epochDayExpr: String = "unix_micros(ts) div 86400000000"

  /** q108's logic over an arbitrary event frame — exposed so specs can
    * pin the integer hour bucketing, the zero-filled grid and the
    * explicit pre-1970 guard.
    */
  def hourProfile(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // the ≤ #types×24-row count table feeds totals and the grid join —
    // persist (session clearCache contract)
    val c = events
      .filter(expr("unix_micros(ts) >= 0"))
      .groupBy(col("event_type"), expr(hourOfDayExpr).as("hour"))
      .agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val t = c.groupBy("event_type").agg(sum(col("n")).as("tot"))
    val grid = t.select(col("event_type"), col("tot"),
      explode(sequence(lit(0), lit(23))).as("hour"))
    grid.join(c, Seq("event_type", "hour"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .select(col("event_type"), col("hour").cast(IntegerType).as("hour"),
        col("n"), expr("(2 * 10000 * n + tot) div (2 * tot)").as("share_e4"))
      .transform(Relational.smallSort(_, "event_type", "hour"))
  }

  private lazy val q108OracleSql: String =
    """WITH c AS (SELECT event_type, CAST((epoch_us(ts) // 3600000000) % 24 AS INT) AS hour,
      |       count(*) AS n FROM events WHERE epoch_us(ts) >= 0 GROUP BY 1, 2),
      |t AS (SELECT event_type, sum(n) AS tot FROM c GROUP BY 1),
      |grid AS (SELECT t.event_type AS event_type, t.tot AS tot,
      |         CAST(unnest(range(0, 24)) AS INT) AS hour FROM t)
      |SELECT g.event_type AS event_type, g.hour AS hour, CAST(coalesce(c.n, 0) AS BIGINT) AS n,
      |  CAST((2 * 10000 * coalesce(c.n, 0) + g.tot) // (2 * g.tot) AS BIGINT) AS share_e4
      |FROM grid g LEFT JOIN c ON c.event_type = g.event_type AND c.hour = g.hour
      |ORDER BY event_type, hour""".stripMargin

  /** q109's logic over an arbitrary document frame — exposed so specs
    * can pin the share arithmetic and token accounting.
    */
  def langMix(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val c = docs
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n"),
        sum(size(TextOps.tokens(col("text"))).cast(LongType)).as("nt"))
    c.withColumn("s", sum(col("n")).over(Window.partitionBy("source")))
      .select(col("source"), col("lang"), col("n").as("n_docs"),
        col("nt").as("n_tokens"),
        expr("(2 * 10000 * n + s) div (2 * s)").as("share_e4"))
      .transform(Relational.smallSort(_, "source", "lang"))
  }

  private lazy val q109OracleSql: String =
    """WITH c AS (SELECT source, lang, count(*) AS n,
      |           sum(len(string_split(text, ' '))) AS nt FROM documents GROUP BY 1, 2)
      |SELECT source, lang, CAST(n AS BIGINT) AS n_docs, CAST(nt AS BIGINT) AS n_tokens,
      |  CAST((2 * 10000 * n + s) // (2 * s) AS BIGINT) AS share_e4
      |FROM (SELECT *, sum(n) OVER (PARTITION BY source) AS s FROM c)
      |ORDER BY source, lang""".stripMargin

  /** q110's logic over an arbitrary event frame — exposed so specs can
    * pin the exact ranks against q72's sketch contract and the
    * value pass-through.
    *
    * `approx` is the 100 TB path the entry's doc declares (VERDICT r10
    * item 2): the exact per-type ordered pass (one task per type over
    * continuous, non-aggregating doubles) is replaced by q72's mergeable
    * Greenwald–Khanna sketch — map-side partials, no rank window, rank
    * error ≤ n/accuracy (exact-degenerate below `accuracy` rows per
    * type). The exact form (default, the oracled entry) is the ground
    * truth the sketch is judged against (the q72 spec's rank-window
    * contract).
    *
    * `autoThreshold` routes by row count — Some(t) takes the sketch iff
    * #non-null rows > t. '''EAGER-ACTION WARNING''' (the rfmSegments
    * caveat): passing Some(t) runs a Spark `count()` action at
    * construction time.
    */
  def valuePercentiles(events: org.apache.spark.sql.DataFrame,
                       approx: Boolean = false,
                       autoThreshold: Option[Long] = None,
                       accuracy: Int = 10000): org.apache.spark.sql.DataFrame = {
    val nonNull = events
      .select(col("event_type"), col("value"), col("event_id"))
      .filter(col("value").isNotNull)
    val useApprox = approx || autoThreshold.exists(t => nonNull.count() > t)
    if (useApprox) {
      nonNull.groupBy("event_type")
        .agg(expr(
          s"percentile_approx(value, array(0.50D, 0.90D, 0.99D), $accuracy)")
          .as("qs"))
        .select(col("event_type"), posexplode(col("qs")).as(Seq("pos", "v")))
        .select(col("event_type"),
          element_at(array(lit(50), lit(90), lit(99)), col("pos") + 1)
            .cast(IntegerType).as("pct"),
          col("v").as("value"))
        .transform(Relational.smallSort(_, "event_type", "pct"))
    } else {
      val wr = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
      nonNull
        .withColumn("rn", row_number().over(wr))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
        .select(col("event_type"), col("value"), col("rn"), col("n"),
          explode(array(lit(50), lit(90), lit(99))).as("pct"))
        .filter(col("rn") === expr("(pct * n + 99) div 100"))
        .select(col("event_type"), col("pct").cast(IntegerType).as("pct"),
          col("value"))
        .transform(Relational.smallSort(_, "event_type", "pct"))
    }
  }

  private lazy val q110OracleSql: String =
    """WITH r AS (SELECT event_type, value,
      |      row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
      |      count(*) OVER (PARTITION BY event_type) AS n
      |      FROM events WHERE value IS NOT NULL)
      |SELECT event_type, CAST(k AS INT) AS pct, value
      |FROM r CROSS JOIN (SELECT unnest([50, 90, 99]) AS k)
      |WHERE rn = (k * n + 99) // 100 ORDER BY event_type, pct""".stripMargin

  /** q125's logic over an arbitrary document frame — exposed so specs
    * can pin hand entropies (uniform over k types = ln k, norm 1;
    * single-type = 0/0-convention) on engineered corpora.
    */
  def tokenEntropy(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val tc = docs
      .select(col("source"),
        explode(graft.functions.expressions.NativeExprs
          .tokenCounts(col("text"))).as("tc"))
      .select(col("source"), col("tc.token").as("token"),
        col("tc.tf").cast(LongType).as("tf"))
      .groupBy("source", "token").agg(sum(col("tf")).as("c"))
    tc.groupBy("source")
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum(col("c").cast(DoubleType)
          * log(col("c").cast(DoubleType))).as("clnc"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        round(log(col("n_tokens")) - col("clnc") / col("n_tokens"), 4)
          .as("entropy"),
        when(col("n_types") === 1L, lit(0.0))
          .otherwise(round(
            (log(col("n_tokens")) - col("clnc") / col("n_tokens"))
              / log(col("n_types")), 4)).as("norm_entropy"))
      .transform(Relational.smallSort(_, "source"))
  }

  /** q129's logic over an arbitrary document frame — exposed so specs can
    * pin the hand-fit slope on an exact power law, the rank tie order,
    * and both integer-guarded degeneracies (single type; all counts
    * tied).
    */
  def zipfSlope(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val tc = docs
      .select(col("source"),
        explode(graft.functions.expressions.NativeExprs
          .tokenCounts(col("text"))).as("tc"))
      .select(col("source"), col("tc.token").as("t"),
        col("tc.tf").cast(LongType).as("tf"))
      .groupBy("source", "t").agg(sum(col("tf")).as("c"))
    val w = Window.partitionBy("source").orderBy(col("c").desc, col("t").asc)
    val lx = log(col("rnk").cast(DoubleType))
    val ly = log(col("c").cast(DoubleType))
    val m = tc.withColumn("rnk", row_number().over(w))
      .groupBy("source")
      .agg(count(lit(1)).as("n"), min(col("c")).as("cmin"),
        max(col("c")).as("cmax"),
        sum(lx).as("sx"), sum(ly).as("sy"), sum(lx * ly).as("sxy"),
        sum(lx * lx).as("sxx"), sum(ly * ly).as("syy"))
    val degenerate = col("n") === 1L || col("cmin") === col("cmax")
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    m.select(col("source"), col("n").as("n_types"),
        when(degenerate, lit(0.0))
          .otherwise(round(
            num / (col("n") * col("sxx") - col("sx") * col("sx")), 4))
          .as("zipf_slope"),
        when(degenerate, lit(0.0))
          .otherwise(round(num * num
            / ((col("n") * col("sxx") - col("sx") * col("sx"))
              * (col("n") * col("syy") - col("sy") * col("sy"))), 4))
          .as("r2"))
      .transform(Relational.smallSort(_, "source"))
  }

  /** q133's logic over an arbitrary document frame — exposed so specs can
    * pin the window boundary (distance 4 in, 5 out), the unordered
    * normalization, the self-pair convention, and a hand PMI value.
    */
  def skipgramPmi(docs: org.apache.spark.sql.DataFrame, window: Int = 4,
                  minSupport: Long = 5L, k: Int = 20)
      : org.apache.spark.sql.DataFrame = {
    val toks = docs.select(TextOps.tokens(col("text")).as("toks"))
      // two explode consumers (pairs, unigrams) — one tokenize pass
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val zips = (1 to window).map { d =>
      arrays_zip(
        slice(col("toks"), lit(1), greatest(size(col("toks")) - d, lit(0)))
          .as("a"),
        slice(col("toks"), lit(1 + d), greatest(size(col("toks")) - d, lit(0)))
          .as("b"))
    }
    val pr = toks.select(explode(concat(zips: _*)).as("p"))
      .select(least(col("p.a"), col("p.b")).as("w1"),
        greatest(col("p.a"), col("p.b")).as("w2"))
    val uni = toks.select(explode(col("toks")).as("w"))
    val pc = pr.groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
    val uc = uni.groupBy("w").agg(count(lit(1)).as("c_w"))
    // totals from the ALREADY-REDUCED count tables — re-deriving them from
    // pr/uni would run the window-4 pair extraction (the query's dominant
    // stage) a second time for identical sums (review finding, r10 s2)
    val tot = pc.agg(sum(col("c_xy")).as("t_p"))
      .crossJoin(uc.agg(sum(col("c_w")).as("t_u")))
    pc
      .join(uc.withColumnRenamed("w", "w1").withColumnRenamed("c_w", "c1"),
        "w1")
      .join(uc.withColumnRenamed("w", "w2").withColumnRenamed("c_w", "c2"),
        "w2")
      .crossJoin(broadcast(tot))
      .filter(col("c_xy") >= minSupport)
      .select(col("w1"), col("w2"), col("c_xy"),
        round(log((col("c_xy") * lit(1.0) / col("t_p")) /
          ((col("c1") * lit(1.0) / col("t_u")) *
            (col("c2") * lit(1.0) / col("t_u")))), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** q102's logic over an arbitrary document frame — exposed so specs
    * can pin the hand-computed Gini values (uniform = 0; [1,3] = 0.25)
    * and tie invariance.
    */
  def lengthGini(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // a tie block of size c at cumulative base (cum − c) occupies ranks
    // base+1 .. base+c, so Σrank·x over the block is
    // len · (c·base + c(c+1)/2) — the row-grain Σrank·x without the
    // row-grain sort (c(c+1) is always even; div 2 is exact)
    lenCum(docs)
      .groupBy("source")
      .agg(max(col("n")).as("n"), sum(col("len") * col("c")).as("sx"),
        sum(expr("len * (c * (cum - c) + (c * (c + 1)) div 2)")).as("sw"))
      .select(col("source"), col("n").as("n_docs"),
        expr("(2 * 10000 * (2 * sw - (n + 1) * sx) + n * sx) div (2 * n * sx)")
          .as("gini_e4"))
      .transform(Relational.smallSort(_, "source"))
  }

  private lazy val q102OracleSql: String =
    """WITH r AS (SELECT source, n_chars,
      |       row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn
      |       FROM documents),
      |a AS (SELECT source, count(*) AS n, sum(n_chars) AS sx, sum(rn * n_chars) AS sw
      |      FROM r GROUP BY 1)
      |SELECT source, CAST(n AS BIGINT) AS n_docs,
      |  CAST((2 * 10000 * (2 * sw - (n + 1) * sx) + n * sx) // (2 * n * sx) AS BIGINT) AS gini_e4
      |FROM a ORDER BY source""".stripMargin

  /** q104's logic over an arbitrary document frame — exposed so specs
    * can pin the rank arithmetic on an engineered ramp (deciles of
    * 1..10 are exactly 1..9).
    */
  def lengthDeciles(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // rank-k value on the cumulative table = min(len | cum ≥ rank_k);
    // the constant-9 explode runs on the CARDINALITY-BOUNDED aggregate
    lenCum(docs)
      .select(col("source"), col("len"), col("cum"), col("n"),
        explode(sequence(lit(1), lit(9))).as("k"))
      .filter(col("cum") >= expr("(k * n + 9) div 10"))
      .groupBy("source", "k")
      .agg(min(col("len")).as("value"))
      .select(col("source"), col("k").cast(IntegerType).as("k"), col("value"))
      .transform(Relational.smallSort(_, "source", "k"))
  }

  private lazy val q104OracleSql: String =
    """WITH r AS (SELECT source, n_chars,
      |       row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
      |       count(*) OVER (PARTITION BY source) AS n FROM documents)
      |SELECT source, CAST(k AS INT) AS k, CAST(n_chars AS BIGINT) AS value
      |FROM r CROSS JOIN (SELECT unnest(range(1, 10)) AS k)
      |WHERE rn = (k * n + 9) // 10
      |ORDER BY source, k""".stripMargin

  /** q105's logic over an arbitrary event frame — exposed so specs can
    * pin the hand-computed concentration values on engineered streams.
    */
  def activityGini(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // the q102 tie-block rule over the (type, count-value) HISTOGRAM:
    // users with equal counts are one tie class, so the per-type rank
    // pass runs on distinct count VALUES (heavy-tailed → few), never on
    // user-cardinality rows
    val uc = events.groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("c"))
    val ws = Window.partitionBy("event_type")
    uc.groupBy("event_type", "c").agg(count(lit(1)).as("f"))
      .withColumn("cum", sum(col("f")).over(ws.orderBy("c")))
      .withColumn("n", sum(col("f")).over(ws))
      .groupBy("event_type")
      .agg(max(col("n")).as("n"), sum(col("c") * col("f")).as("sx"),
        sum(expr("c * (f * (cum - f) + (f * (f + 1)) div 2)")).as("sw"))
      .select(col("event_type"), col("n").as("n_users"),
        expr("(2 * 10000 * (2 * sw - (n + 1) * sx) + n * sx) div (2 * n * sx)")
          .as("gini_e4"))
      .transform(Relational.smallSort(_, "event_type"))
  }

  private lazy val q105OracleSql: String =
    """WITH c AS (SELECT event_type, user_id, count(*) AS c FROM events GROUP BY 1, 2),
      |r AS (SELECT event_type, c,
      |      row_number() OVER (PARTITION BY event_type ORDER BY c, user_id) AS rn
      |      FROM c),
      |a AS (SELECT event_type, count(*) AS n, sum(c) AS sx, sum(rn * c) AS sw
      |      FROM r GROUP BY 1)
      |SELECT event_type, CAST(n AS BIGINT) AS n_users,
      |  CAST((2 * 10000 * (2 * sw - (n + 1) * sx) + n * sx) // (2 * n * sx) AS BIGINT) AS gini_e4
      |FROM a ORDER BY event_type""".stripMargin

  private lazy val q100OracleSql: String =
    """WITH r AS (SELECT source, n_chars,
      |        row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
      |        count(*) OVER (PARTITION BY source) AS n FROM documents),
      |th AS (SELECT source, n AS n_docs, n_chars AS p90 FROM r WHERE rn = (90 * n + 99) // 100)
      |SELECT t.source AS source, CAST(t.n_docs AS BIGINT) AS n_docs, CAST(t.p90 AS BIGINT) AS p90,
      |  CAST(count(*) FILTER (WHERE d.n_chars > t.p90) AS BIGINT) AS n_clipped,
      |  CAST(coalesce(sum(CASE WHEN d.n_chars > t.p90 THEN d.n_chars - t.p90 END), 0) AS BIGINT) AS chars_saved
      |FROM documents d JOIN th t ON d.source = t.source
      |GROUP BY t.source, t.n_docs, t.p90 ORDER BY source""".stripMargin

  /** q87's logic over an arbitrary event frame — exposed so specs can pin
    * the gap cut, the (ts, event_id) tie order, and the probability
    * rounding against a driver-side replay on engineered streams.
    */
  def sessionTransitions(events: org.apache.spark.sql.DataFrame,
                         gapUs: Long = 1800000000L): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val x = events
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .withColumn("nus", lead(col("us"), 1).over(w))
    val c = x
      .filter(col("nxt").isNotNull && col("nus") - col("us") <= gapUs)
      .groupBy(col("event_type").as("src_type"), col("nxt").as("dst_type"))
      .agg(count(lit(1)).as("n"))
    c.withColumn("s", sum(col("n")).over(Window.partitionBy("src_type")))
      .select(col("src_type"), col("dst_type"), col("n"),
        expr("(2 * 10000 * n + s) div (2 * s)").as("p_e4"))
      .transform(Relational.smallSort(_, "src_type", "dst_type"))
  }
}
