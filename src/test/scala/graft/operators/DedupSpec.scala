package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Dedup operator family: exact facade vs q28, SimHash banding's pigeonhole
  * exactness vs a brute-force hamming join, and embedding pairs' recall vs
  * the exhaustive q33.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exactKeepMin == q28 oracle semantics") {
    val docs = Tables.documents(spark, sf0001)
    val op = Dedup.exactKeepMin(docs, "doc_id", "text")
      .select("doc_id").orderBy("doc_id")
    val q28 = graft.queries.Catalog.byName("q28_dedup_exact").build(spark, sf0001)
    assert(op.exceptAll(q28).isEmpty && q28.exceptAll(op).isEmpty)
  }

  test("connectedComponents — chains, cliques, and deep paths get min labels") {
    // two nontrivial components (a 3-chain and a triangle) plus a 41-node
    // path — the deep path converges only because of pointer jumping
    // (plain propagation moves labels one hop per round). Run BOTH paths:
    // the default driver union-find and the forced distributed loop
    // (maxDriverEdges = 0) — r17 requires them label-identical.
    val chain = Seq((1L, 2L), (2L, 3L))
    val clique = Seq((20L, 21L), (21L, 22L), (20L, 22L))
    val path = (100L until 140L).map(i => (i, i + 1))
    val pairs = (chain ++ clique ++ path).toDF("i", "j")
    Seq(4000000L, 0L).foreach { budget =>
      val comp = Dedup.connectedComponents(pairs, "i", "j",
        maxDriverEdges = budget)
      val got = comp.as[(Long, Long)].collect().toMap
      comp.unpersist()
      assert(Seq(1L, 2L, 3L).forall(got(_) == 1L), s"budget=$budget")
      assert(Seq(20L, 21L, 22L).forall(got(_) == 20L), s"budget=$budget")
      assert((100L to 140L).forall(got(_) == 100L), s"budget=$budget")
      assert(got.size === 3 + 3 + 41, s"budget=$budget")
    }
  }

  test("connectedComponents — RELIABLE checkpoint path when a checkpoint dir is set") {
    // same labels as the localCheckpoint path, and checkpoint files must
    // actually land in the configured dir. The shared SparkContext has no
    // public checkpoint-dir unset, so restore the private field afterwards
    // — otherwise every later connectedComponents call in the JVM silently
    // switches to the reliable path.
    val sc = spark.sparkContext
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_ckpt")
    sc.setCheckpointDir(dir.toString)
    try {
      val pairs = (Seq((1L, 2L), (2L, 3L)) ++ (100L until 120L).map(i => (i, i + 1)))
        .toDF("i", "j")
      // force the distributed loop (the driver union-find never touches
      // the checkpoint machinery this test exists to exercise)
      val got = Dedup.connectedComponents(pairs, "i", "j",
          maxDriverEdges = 0L)
        .as[(Long, Long)].collect().toMap
      assert(Seq(1L, 2L, 3L).forall(got(_) == 1L))
      assert((100L to 120L).forall(got(_) == 100L))
      val nCkptFiles = java.nio.file.Files.walk(dir)
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(nCkptFiles > 0, s"no reliable checkpoint files under $dir")
    } finally {
      val f = sc.getClass.getDeclaredFields
        .find(_.getName.contains("checkpointDir"))
        .getOrElse(fail("SparkContext.checkpointDir field not found"))
      f.setAccessible(true)
      f.set(sc, None)
    }
  }

  test("simhashPairs == brute-force hamming join (pigeonhole exactness)") {
    val docs = Tables.documents(spark, sf0001)
    val banded = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
    // brute force over all fingerprint pairs
    val fp = docs.select($"doc_id",
      graft.functions.TextOps.simhash32(
        graft.functions.TextOps.tokens($"text")).as("fp"))
    val l = fp.select($"doc_id".as("i"), $"fp".as("a"))
    val r = fp.select($"doc_id".as("j"), $"fp".as("b"))
    val brute = l.join(broadcast(r), $"i" < $"j")
      .withColumn("hamming", bit_count($"a".bitwiseXOR($"b")).cast("int"))
      .filter($"hamming" <= 3)
      .select("i", "j", "hamming")
    assert(banded.exceptAll(brute).isEmpty && brute.exceptAll(banded).isEmpty)
    assert(banded.count() > 0) // the corpus does contain near-dups
  }

  test("embeddingPairs — total recall in its regime (true near-dups), pruned") {
    // synthetic corpus: 200 random vectors + 10 jittered copies (cosine
    // > 0.98 to their originals) — the near-duplicate regime the operator
    // documents. All 10 planted pairs must surface; candidate generation
    // must prune, not scan.
    val rnd = new scala.util.Random(5)
    def vec() = Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat)
    val base = (0L until 200L).map(i => (i, vec()))
    val dups = base.take(10).map { case (i, v) =>
      (1000L + i, v.map(x => x + (rnd.nextDouble() * 0.02 - 0.01).toFloat))
    }
    val df = (base ++ dups).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingPairs(df, "vec_id", "embedding",
      minCosine = 0.9, ring = 3)
    val found = pairs.select("i", "j").as[(Long, Long)].collect().toSet
    (0L until 10L).foreach { i =>
      assert(found.contains((i, 1000L + i)), s"planted dup $i not found")
    }
    // exact-verify step guarantees precision: every pair really is ≥ 0.9
    assert(pairs.filter($"score" < 0.9).count() === 0)
    // subset sanity at the low-threshold setting: LSH never invents pairs
    val e = Tables.embeddings(spark, sf0001)
    val lshLow = Dedup.embeddingPairs(e, "vec_id", "embedding",
      minCosine = 0.4, ring = 4).select("i", "j")
    val exact = graft.queries.Catalog.byName("q33_embedding_neardup")
      .build(spark, sf0001).select("i", "j")
    assert(lshLow.exceptAll(exact).isEmpty)
  }

  test("coShingledPairsDetached == the persisted core, with nothing cached") {
    // the persist-free form for callers outside the session-cache
    // contract must produce the identical pair set and leave the cache
    // manager untouched
    spark.catalog.clearCache()
    val docs = Tables.documents(spark, sf0001)
    val detached = Dedup.coShingledPairsDetached(docs, "doc_id", "text")
      .select("i", "j", "k", "ni", "nj")
    assert(spark.sharedState.cacheManager.isEmpty,
      "the Detached form cached something")
    val (wc, sh) = Dedup.coShingledPairs(docs, "doc_id", "text")
    val persisted = wc.select("i", "j", "k", "ni", "nj")
    assert(detached.exceptAll(persisted).isEmpty &&
           persisted.exceptAll(detached).isEmpty)
    sh.unpersist()
  }

  test("broadcastCounts=false fallback — identical pair set through the shuffle attach (VERDICT r14 #3)") {
    // the documented >100M-doc scale lever (count table outgrows the
    // broadcast budget) was never executed by a spec: a refactor could
    // silently break the non-broadcast path. Row identity across both
    // settings, on both the persisted and detached forms.
    spark.catalog.clearCache()
    val docs = Tables.documents(spark, sf0001)
    val cols = Seq("i", "j", "k", "ni", "nj")
    val (bt, sh1) = Dedup.coShingledPairs(docs, "doc_id", "text")
    val broadcastForm = bt.select(cols.head, cols.tail: _*)
    val (st, sh2) = Dedup.coShingledPairs(docs, "doc_id", "text",
      broadcastCounts = false)
    val shuffleForm = st.select(cols.head, cols.tail: _*)
    assert(shuffleForm.exceptAll(broadcastForm).isEmpty &&
           broadcastForm.exceptAll(shuffleForm).isEmpty)
    sh1.unpersist(); sh2.unpersist()
    val detachedShuffle = Dedup.coShingledPairsDetached(docs, "doc_id",
      "text", broadcastCounts = false).select(cols.head, cols.tail: _*)
    val detachedBroadcast = Dedup.coShingledPairsDetached(docs, "doc_id",
      "text").select(cols.head, cols.tail: _*)
    assert(detachedShuffle.exceptAll(detachedBroadcast).isEmpty &&
           detachedBroadcast.exceptAll(detachedShuffle).isEmpty)
  }
}
