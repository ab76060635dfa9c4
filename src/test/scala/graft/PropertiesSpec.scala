package graft

import graft.etl.DocOps
import org.apache.spark.sql.functions._

/** Remaining property tests from SURVEY §5.3: S13 filename derivation total
  * on arbitrary URLs, Q22 set-operation algebraic laws, and CountInSet vs
  * the HOF filter formulation.
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  test("S13 — baseNameOf/titleOf total on arbitrary URL shapes (never null/throw)") {
    val rnd = new scala.util.Random(11)
    val parts = Seq("https://x.org", "http://a", "", "/", "//", "a b", "%20",
      "ፍርድ", "v.pdf", ".pdf", "dir/", "?q=1", "#f", "v%20%20x.pdf", "..", "%%")
    val urls = (0 until 200).map(_ =>
      (0 until rnd.nextInt(5)).map(_ => parts(rnd.nextInt(parts.size))).mkString)
    val df = urls.toDF("url")
      .select($"url", DocOps.baseNameOf($"url").as("base"))
      .withColumn("title", DocOps.titleOf($"base"))
    assert(df.filter($"base".isNull || $"title".isNull).count() === 0)
    // reference semantics spot-rule: base never contains '/' or '%20'
    assert(df.filter($"base".contains("/") || $"base".contains("%20")).count() === 0)
  }

  test("connectedComponents == union-find on seeded random graphs") {
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { trial =>
      val n = 60 + trial * 40
      val edges = (1 to n * 2).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter { case (i, j) => i != j }.distinct
      // driver-side union-find reference
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (i, j) =>
        val (ri, rj) = (find(i), find(j))
        if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
      }
      val nodes = edges.flatMap { case (i, j) => Seq(i, j) }.distinct
      val want = nodes.map { u =>
        // representative = component minimum, by min-union above
        u -> find(u)
      }.toMap
      // both physical paths (r17): driver union-find (default budget) and
      // the forced distributed pointer-jumping loop must match the
      // reference
      Seq(4000000L, 0L).foreach { budget =>
        val comp = graft.operators.Dedup.connectedComponents(
          edges.toDF("i", "j"), "i", "j", maxDriverEdges = budget)
        val got = comp.as[(Long, Long)].collect().toMap
        comp.unpersist()
        assert(got === want,
          s"trial $trial budget=$budget: components diverge from union-find")
      }
    }
  }

  test("Q22 — set algebra laws on real key sets") {
    val a = Tables.customer(spark, sf0001).filter($"c_acctbal" > 5000)
      .select($"c_custkey".as("k"))
    val b = Tables.orders(spark, sf0001)
      .select($"o_custkey".as("k")).distinct()
    val aD = a.distinct()
    // |A ∪ B| = |A| + |B| - |A ∩ B|
    val union = a.union(b).distinct().count()
    val inter = a.intersect(b).count()
    assert(union === aD.count() + b.count() - inter)
    // A \ B and A ∩ B partition A
    val except = a.except(b).count()
    assert(except + inter === aD.count())
    // idempotence and commutativity
    assert(a.intersect(b).count() === b.intersect(a).count())
    assert(a.union(a).distinct().count() === aD.count())
  }

  test("S10 — ordered concat invariant under input partition shuffling") {
    val events = Tables.events(spark, sf0001).filter($"event_type" === "error")
    def runWith(parts: Int) = events.repartition(parts)
      .groupBy("user_id")
      .agg(array_join(
        expr("transform(array_sort(collect_list(struct(ts, event_id))), x -> cast(x.event_id as string))"),
        ",").as("c"))
    val a = runWith(1)
    val b = runWith(17)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("decontamination — broadcast-exact == bloom-prefiltered on seeded corpora") {
    // the two strategies declare byte-identical results; pin it on random
    // corpora with ENGINEERED overlap: every third corpus doc embeds a
    // span (of varying length 3..10 words) copied from a bench doc, so
    // multi-shingle n_overlap counts and the false-positive-removal path
    // are exercised deterministically — not left to chance collisions
    import graft.operators.Decontaminate
    val rnd = new scala.util.Random(23)
    val vocab = (0 until 4000).map(i => s"w$i") // big vocab: no chance overlap
    def words(n: Int): Seq[String] =
      (0 until n).map(_ => vocab(rnd.nextInt(vocab.size)))
    val benchDocs = (0L until 6L).map(id => (id, words(20).mkString(" ")))
    val corpusDocs = (6L until 60L).map { id =>
      val base = words(5 + rnd.nextInt(25))
      val text =
        if (id % 3 == 0) {
          // splice a 3..10-word span from a random bench doc mid-document
          val bench = benchDocs(rnd.nextInt(benchDocs.size))._2.split(" ")
          val spanLen = 3 + rnd.nextInt(8)
          val from = rnd.nextInt(bench.length - spanLen + 1)
          val at = rnd.nextInt(base.length + 1)
          (base.take(at) ++ bench.slice(from, from + spanLen) ++ base.drop(at))
            .mkString(" ")
        } else base.mkString(" ")
      (id, text)
    }
    val docs = (benchDocs ++ corpusDocs).toDF("doc_id", "text")
    val shingled = Decontaminate.shingleSet(docs, "doc_id", "text")
    val benchSh = shingled.filter($"doc_id" < 6)
    val corpusSh = shingled.filter($"doc_id" >= 6)
    val spine = docs.filter($"doc_id" >= 6).select("doc_id")
    val exact = Decontaminate.overlap(corpusSh, benchSh, spine, "doc_id")
    val bloomed = Decontaminate.overlapBloom(corpusSh, benchSh, spine, "doc_id")
    assert(exact.exceptAll(bloomed).isEmpty && bloomed.exceptAll(exact).isEmpty)
    // every spliced doc with a span of >= 3 words carries >= 1 full
    // 3-shingle from its bench doc; spans of 5+ words exercise
    // multi-shingle counts
    assert(exact.filter($"contaminated").count() >= 10)
    assert(exact.filter($"n_overlap" > 1).count() > 0)
  }

  test("countInSet == size(filter(isInCollection)) on corpus tokens") {
    val words = Seq("the", "a", "of", "and", "to", "in", "is")
    val docs = Tables.documents(spark, sf0001)
      .select(split($"text", " ").as("toks"))
    val diff = docs.select(
        graft.functions.TextOps.stopwordHits($"toks", words).as("fast"),
        size(filter($"toks", t => t.isInCollection(words))).as("hof"))
      .filter($"fast" =!= $"hof")
    assert(diff.count() === 0)
  }

  test("closure family — results invariant under input repartitioning") {
    // q76/q79's determinism claims (TopKAgg argmax ties, CC labels, hash
    // membership, integer arithmetic) must survive ANY physical layout:
    // a skewed coalesce and a wide shuffle produce identical rows
    val base = Tables.documents(spark, sf0001)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val layouts = Seq(
      base.repartition(17, $"source"),
      base.coalesce(1))
    val repsRef = rows(graft.queries.Curation.clusterReps(base))
    val sampRef = rows(graft.queries.Curation.dupAwareSample(base))
    layouts.foreach { l =>
      assert(rows(graft.queries.Curation.clusterReps(l)) === repsRef)
      assert(rows(graft.queries.Curation.dupAwareSample(l)) === sampRef)
      spark.catalog.clearCache()
    }
  }

  test("q81 IVF route — results invariant under embedding repartitioning") {
    // the trained-codebook walk (Lloyd iterations, per-round checkpoints,
    // broadcast codebook, TopKAgg ties) must be a pure function of the
    // DATA, not its physical layout
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    def quantized(e: org.apache.spark.sql.DataFrame) =
      graft.queries.Curation.quantizeVectors(e)
    val base = Tables.embeddings(spark, sf0001)
    val ref = rows(graft.queries.Curation.ivfRoute(quantized(base)))
    Seq(base.repartition(13, $"label"), base.coalesce(1)).foreach { l =>
      assert(rows(graft.queries.Curation.ivfRoute(quantized(l))) === ref)
      spark.catalog.clearCache()
    }
  }

  test("q82 TextRank — results invariant under document repartitioning") {
    // the integer walk (broadcast rank frame, checkpointed rounds, integer
    // divisions, TopKAgg rank ties) survives any layout
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val name = "q82_textrank"
    val ref = rows(graft.queries.Catalog.byName(name).build(spark, sf0001))
    // rebuild through the catalog on a re-laid-out COPY of the table: write
    // the skewed layout and point the builder at it
    val tmp = java.nio.file.Files.createTempDirectory("graft_q82_layout").toString
    try {
      val docs = Tables.documents(spark, sf0001)
      docs.repartition(17, $"source").write.mode("overwrite")
        .parquet(s"$tmp/documents.parquet")
      val got = rows(graft.queries.Catalog.byName(name).build(spark, tmp))
      assert(got === ref)
    } finally {
      spark.catalog.clearCache()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("q83/q84 — md5-LSH and label propagation invariant under doc repartitioning") {
    // the LSH signature (per-doc HOF min), band self-join, broadcast-driven
    // verification, and the clamped majority walk are all pure functions of
    // the data — a skewed layout must not change a single row
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val base = Tables.documents(spark, sf0001)
    val lshRef = rows(graft.queries.Curation.lshMd5Pairs(base))
    spark.catalog.clearCache()
    val lpRef = rows(graft.queries.Curation.labelPropagation(base))
    spark.catalog.clearCache()
    Seq(base.repartition(17, $"source"), base.coalesce(1)).foreach { l =>
      assert(rows(graft.queries.Curation.lshMd5Pairs(l)) === lshRef)
      spark.catalog.clearCache()
      assert(rows(graft.queries.Curation.labelPropagation(l)) === lpRef)
      spark.catalog.clearCache()
    }
  }

  test("q86/q88 — leakage audit and BPE training invariant under doc repartitioning") {
    // the digest join, half-up rollup, per-round pair counts and the
    // (count DESC, lexicographic) argmax are pure functions of the data —
    // a skewed layout must not change a merge or a fraction
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val base = Tables.documents(spark, sf0001)
    val leakRef = rows(graft.queries.Curation.splitLeakage(base))
    spark.catalog.clearCache()
    val bpeRef = rows(graft.queries.Curation.bpeMerges(base))
    spark.catalog.clearCache()
    Seq(base.repartition(17, $"source"), base.coalesce(1)).foreach { l =>
      assert(rows(graft.queries.Curation.splitLeakage(l)) === leakRef)
      spark.catalog.clearCache()
      assert(rows(graft.queries.Curation.bpeMerges(l)) === bpeRef)
      spark.catalog.clearCache()
    }
  }

  test("q92/q94/q95 — encode, chunk dedup and boilerplate invariant under doc repartitioning") {
    // word-level encoding, the ≥2-distinct-docs chunk rule and the
    // per-source min-support are pure functions of the data — a skewed
    // or single-partition layout must not move a count or a ratio
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val base = Tables.documents(spark, sf0001)
    val encRef = rows(graft.queries.Curation.bpeEncode(base))
    spark.catalog.clearCache()
    val chunkRef = rows(graft.queries.Curation.chunkDedup(base))
    val boilerRef = rows(graft.queries.Curation.boilerplateScreen(base))
    Seq(base.repartition(17, $"source"), base.coalesce(1)).foreach { l =>
      assert(rows(graft.queries.Curation.bpeEncode(l)) === encRef)
      spark.catalog.clearCache()
      assert(rows(graft.queries.Curation.chunkDedup(l)) === chunkRef)
      assert(rows(graft.queries.Curation.boilerplateScreen(l)) === boilerRef)
    }
  }

  test("q98/q99/q100/q101 — itemsets, KS, clip and drift invariant under repartitioning") {
    // session pairing, cumulative-CDF cross-multiplication, order
    // statistics and integer centroid sums are pure functions of the
    // data — a skewed or single-partition layout must not move a value
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val ev = Tables.events(spark, sf0001)
    val docs = Tables.documents(spark, sf0001)
    val emb = Tables.embeddings(spark, sf0001)
    val itemRef = rows(graft.queries.Analytics.sessionItemsets(ev))
    spark.catalog.clearCache()
    val ksRef = rows(graft.queries.Analytics.lengthKs(docs))
    spark.catalog.clearCache()
    val clipRef = rows(graft.queries.Analytics.lengthClip(docs))
    val driftRef = rows(graft.queries.Curation.centroidDrift(emb))
    spark.catalog.clearCache()
    Seq(17, 1).foreach { n =>
      val (e, d, m) =
        if (n == 1) (ev.coalesce(1), docs.coalesce(1), emb.coalesce(1))
        else (ev.repartition(n, $"event_type"),
          docs.repartition(n, $"source"), emb.repartition(n, $"label"))
      assert(rows(graft.queries.Analytics.sessionItemsets(e)) === itemRef)
      spark.catalog.clearCache()
      assert(rows(graft.queries.Analytics.lengthKs(d)) === ksRef)
      spark.catalog.clearCache()
      assert(rows(graft.queries.Analytics.lengthClip(d)) === clipRef)
      assert(rows(graft.queries.Curation.centroidDrift(m)) === driftRef)
      spark.catalog.clearCache()
    }
  }

  test("q102/q103/q104/q105 — Gini, split parity and deciles invariant under repartitioning") {
    // rank·mass sums, md5-split histograms and order statistics are pure
    // functions of the data — layout must not move an integer
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val ev = Tables.events(spark, sf0001)
    val docs = Tables.documents(spark, sf0001)
    val giniRef = rows(graft.queries.Analytics.lengthGini(docs))
    val decRef = rows(graft.queries.Analytics.lengthDeciles(docs))
    val actRef = rows(graft.queries.Analytics.activityGini(ev))
    val parRef = rows(graft.queries.Curation.splitParity(docs))
    spark.catalog.clearCache()
    Seq(17, 1).foreach { n =>
      val (e, d) =
        if (n == 1) (ev.coalesce(1), docs.coalesce(1))
        else (ev.repartition(n, $"event_type"),
          docs.repartition(n, $"source"))
      assert(rows(graft.queries.Analytics.lengthGini(d)) === giniRef)
      assert(rows(graft.queries.Analytics.lengthDeciles(d)) === decRef)
      assert(rows(graft.queries.Analytics.activityGini(e)) === actRef)
      assert(rows(graft.queries.Curation.splitParity(d)) === parRef)
      spark.catalog.clearCache()
    }
  }

  test("q107/q108/q109/q110 — cadence, seasonality, mix and percentiles invariant under repartitioning") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val ev = Tables.events(spark, sf0001)
    val docs = Tables.documents(spark, sf0001)
    val gapRef = rows(graft.queries.Analytics.gapDeciles(ev))
    val hourRef = rows(graft.queries.Analytics.hourProfile(ev))
    spark.catalog.clearCache()
    val mixRef = rows(graft.queries.Analytics.langMix(docs))
    val pctRef = rows(graft.queries.Analytics.valuePercentiles(ev))
    Seq(17, 1).foreach { n =>
      val (e, d) =
        if (n == 1) (ev.coalesce(1), docs.coalesce(1))
        else (ev.repartition(n, $"user_id"), docs.repartition(n, $"lang"))
      assert(rows(graft.queries.Analytics.gapDeciles(e)) === gapRef)
      assert(rows(graft.queries.Analytics.hourProfile(e)) === hourRef)
      spark.catalog.clearCache()
      assert(rows(graft.queries.Analytics.langMix(d)) === mixRef)
      assert(rows(graft.queries.Analytics.valuePercentiles(e)) === pctRef)
    }
  }

  test("q111/q112 — rules and quality-length corr invariant under repartitioning") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val ev = Tables.events(spark, sf0001)
    val docs = Tables.documents(spark, sf0001)
    val ruleRef = rows(graft.queries.Analytics.sessionRules(ev))
    spark.catalog.clearCache()
    val corrRef = rows(graft.queries.Llm.qualityLengthCorr(docs))
    Seq(17, 1).foreach { n =>
      val (e, d) =
        if (n == 1) (ev.coalesce(1), docs.coalesce(1))
        else (ev.repartition(n, $"user_id"), docs.repartition(n, $"source"))
      assert(rows(graft.queries.Analytics.sessionRules(e)) === ruleRef)
      spark.catalog.clearCache()
      assert(rows(graft.queries.Llm.qualityLengthCorr(d)) === corrRef)
    }
  }

  test("q113 — time split invariant under repartitioning") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val ev = Tables.events(spark, sf0001)
    val ref = rows(graft.queries.Analytics.timeSplit(ev))
    spark.catalog.clearCache()
    Seq(ev.repartition(17, $"event_type"), ev.coalesce(1)).foreach { e =>
      assert(rows(graft.queries.Analytics.timeSplit(e)) === ref)
      spark.catalog.clearCache()
    }
  }

  test("q114/q115/q116/q117/q118/q123/q124 — session-5 analytics invariant under repartitioning") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val ev = Tables.events(spark, sf0001)
    val docs = Tables.documents(spark, sf0001)
    val emb = Tables.embeddings(spark, sf0001)
    val stRef = rows(graft.queries.Analytics.stickiness(ev))
    val lagRef = rows(graft.queries.Analytics.conversionLag(ev))
    spark.catalog.clearCache()
    val burstRef = rows(graft.queries.Analytics.hourBurst(ev))
    spark.catalog.clearCache()
    val cfRef = rows(graft.queries.Curation.labelConfusion(emb))
    spark.catalog.clearCache()
    val nrmRef = rows(graft.queries.Curation.normAudit(emb))
    spark.catalog.clearCache()
    val dimRef = rows(graft.queries.Curation.dimVariance(emb))
    spark.catalog.clearCache()
    val biasRef = rows(graft.queries.Curation.dupQualityBias(docs))
    spark.catalog.clearCache()
    Seq(17, 1).foreach { n =>
      val (e, d, m) =
        if (n == 1) (ev.coalesce(1), docs.coalesce(1), emb.coalesce(1))
        else (ev.repartition(n, $"user_id"),
          docs.repartition(n, $"source"), emb.repartition(n, $"label"))
      assert(rows(graft.queries.Analytics.stickiness(e)) === stRef)
      assert(rows(graft.queries.Analytics.conversionLag(e)) === lagRef)
      spark.catalog.clearCache()
      assert(rows(graft.queries.Analytics.hourBurst(e)) === burstRef)
      spark.catalog.clearCache()
      assert(rows(graft.queries.Curation.labelConfusion(m)) === cfRef)
      spark.catalog.clearCache()
      assert(rows(graft.queries.Curation.normAudit(m)) === nrmRef)
      spark.catalog.clearCache()
      assert(rows(graft.queries.Curation.dimVariance(m)) === dimRef)
      spark.catalog.clearCache()
      assert(rows(graft.queries.Curation.dupQualityBias(d)) === biasRef)
      spark.catalog.clearCache()
    }
  }

  test("q119 — LTV profile invariant under repartitioning") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val o = Tables.orders(spark, sf0001)
    val cu = Tables.customer(spark, sf0001)
    val ref = rows(graft.queries.Relational.ltvProfile(o, cu))
    spark.catalog.clearCache()
    Seq((o.repartition(17, $"o_custkey"), cu.coalesce(1)),
      (o.coalesce(1), cu.repartition(17, $"c_mktsegment"))).foreach {
      case (oo, cc) =>
        assert(rows(graft.queries.Relational.ltvProfile(oo, cc)) === ref)
        spark.catalog.clearCache()
    }
  }

  test("q120/q121/q122 — df histogram, lang agreement and MAD screen invariant under repartitioning") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val docs = Tables.documents(spark, sf0001)
    val dfRef = rows(graft.queries.Llm.shingleDfHistogram(docs))
    spark.catalog.clearCache()
    val agRef = rows(graft.queries.Llm.langAgreement(docs))
    spark.catalog.clearCache()
    val madRef = rows(graft.queries.Analytics.lengthMad(docs))
    spark.catalog.clearCache()
    Seq(docs.repartition(17, $"source"), docs.coalesce(1)).foreach { l =>
      assert(rows(graft.queries.Llm.shingleDfHistogram(l)) === dfRef)
      assert(rows(graft.queries.Llm.langAgreement(l)) === agRef)
      spark.catalog.clearCache()
      assert(rows(graft.queries.Analytics.lengthMad(l)) === madRef)
      spark.catalog.clearCache()
    }
  }

  test("q106 — near-dup sweep invariant under doc repartitioning") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val docs = Tables.documents(spark, sf0001)
    val ref = rows(graft.queries.Llm.neardupSweep(docs))
    spark.catalog.clearCache()
    Seq(docs.repartition(17, $"source"), docs.coalesce(1)).foreach { l =>
      assert(rows(graft.queries.Llm.neardupSweep(l)) === ref)
      spark.catalog.clearCache()
    }
  }

  test("q128-q135 — round-10 additions invariant under repartitioning") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val docs = Tables.documents(spark, sf0001)
    val fidRef = rows(graft.queries.Curation.lshFidelity(docs))
    spark.catalog.clearCache()
    val zipfRef = rows(graft.queries.Analytics.zipfSlope(docs))
    spark.catalog.clearCache()
    val degRef = rows(graft.queries.Llm.neardupDegree(docs))
    spark.catalog.clearCache()
    val pmiRef = rows(graft.queries.Analytics.skipgramPmi(docs))
    spark.catalog.clearCache()
    val incRef = rows(graft.queries.Curation.lshIncremental(docs))
    spark.catalog.clearCache()
    val wsRef = rows(graft.queries.Llm.weightedSample(docs))
    spark.catalog.clearCache()
    Seq(docs.repartition(17, $"source"), docs.coalesce(1)).foreach { l =>
      assert(rows(graft.queries.Curation.lshFidelity(l)) === fidRef)
      spark.catalog.clearCache()
      assert(rows(graft.queries.Analytics.zipfSlope(l)) === zipfRef)
      spark.catalog.clearCache()
      assert(rows(graft.queries.Llm.neardupDegree(l)) === degRef)
      spark.catalog.clearCache()
      assert(rows(graft.queries.Analytics.skipgramPmi(l)) === pmiRef)
      spark.catalog.clearCache()
      assert(rows(graft.queries.Curation.lshIncremental(l)) === incRef)
      spark.catalog.clearCache()
      assert(rows(graft.queries.Llm.weightedSample(l)) === wsRef)
      spark.catalog.clearCache()
    }
    val emb = graft.queries.Curation
      .quantizeVectors(Tables.embeddings(spark, sf0001))
    val recRef = rows(graft.queries.Curation.ivfRecall(emb))
    spark.catalog.clearCache()
    val balRef = rows(graft.queries.Curation.cellBalance(emb))
    spark.catalog.clearCache()
    assert(rows(graft.queries.Curation.ivfRecall(emb.repartition(13))) ===
      recRef)
    spark.catalog.clearCache()
    assert(rows(graft.queries.Curation.cellBalance(emb.repartition(13))) ===
      balRef)
    spark.catalog.clearCache()
  }

  test("q97 — max_by last-within-day ≡ the row_number window on random tied streams (ScalaCheck)") {
    // the r13 plan swap's determinism claim: max_by over the totally-
    // ordered (us, event_id) struct picks EXACTLY the row the
    // row_number() OVER (PARTITION BY user, day ORDER BY us DESC,
    // event_id DESC) window picked, on streams engineered for ties —
    // duplicate timestamps (same user, same day, same us, distinct
    // event_ids), event-less days, multi-day users
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    import org.apache.spark.sql.expressions.Window
    val genEvent = for {
      user <- Gen.choose(1L, 5L)
      day <- Gen.choose(0L, 4L)
      usInDay <- Gen.choose(0L, 3L) // tiny range -> frequent exact ties
      eid <- Gen.choose(1L, 1000000L)
      v <- Gen.choose(-100, 100).map(_.toDouble)
    } yield (user, day * 86400000000L + usInDay, eid, v)
    // distinct event_ids (the corpus invariant the determinism rests on)
    val genStream = Gen.listOfN(60, genEvent).map(_.distinctBy(_._3))
    val prop = Prop.forAll(genStream) { evs =>
      evs.isEmpty || {
        val df = evs.toDF("user_id", "us", "event_id", "value")
          .select(col("user_id"),
            timestamp_micros(col("us")).as("ts"),
            col("event_id"), col("value"))
        val viaAgg = graft.queries.Analytics.pitFeatures(df)
          .collect().map(_.toSeq).toSeq
        spark.catalog.clearCache()
        // the pre-r13 window form, inlined as the reference semantics
        val e = df.select(col("user_id"), unix_micros(col("ts")).as("us"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          col("event_id"), col("value"))
        val wd = Window.partitionBy("user_id", "day")
          .orderBy(col("us").desc, col("event_id").desc)
        val lastPerDay = e.withColumn("_rn", row_number().over(wd))
          .filter(col("_rn") === 1)
          .select(col("user_id"), col("day"), col("value"))
        val grid = e.groupBy("user_id").agg(min(col("day")).as("mn"))
          .crossJoin(e.agg(max(col("day")).as("mx")))
          .select(col("user_id"),
            explode(sequence(col("mn"), col("mx"))).as("day"))
        val fill = Window.partitionBy("user_id").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val viaWindow = grid.join(lastPerDay, Seq("user_id", "day"), "left")
          .withColumn("last_val",
            last(col("value"), ignoreNulls = true).over(fill))
          .filter(col("last_val").isNotNull)
          .select(col("user_id"), col("day"), col("last_val"))
          .orderBy("user_id", "day")
          .collect().map(_.toSeq).toSeq
        viaAgg == viaWindow
      }
    }
    val res = ScTest.check(ScTest.Parameters.default
      .withMinSuccessfulTests(20)
      .withInitialSeed(org.scalacheck.rng.Seed(13L)), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }
}
