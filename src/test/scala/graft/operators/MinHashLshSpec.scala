package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** MinHash-LSH near-dup detection vs the exact inverted-index Jaccard
  * (q31) — the probabilistic scale path must recover the exact pairs at the
  * declared threshold (SURVEY §2.2 q32; r=2, b=24 → P(candidate) ≥ 0.999 at
  * j = 0.5).
  */
class MinHashLshSpec extends SparkSpec {

  test("LSH pairs == exact Jaccard pairs at threshold 0.5 (sf0.001)") {
    val docs = Tables.documents(spark, sf0001)
    val exact = graft.queries.Catalog.byName("q31_jaccard_pairs")
      .build(spark, sf0001).select("i", "j")
    val lsh = MinHashLsh.nearDupPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("i", "j")
    // exact verify step makes precision 1.0 by construction; recall is the
    // probabilistic part — assert full recovery on this corpus
    assert(lsh.exceptAll(exact).count() === 0, "LSH produced a non-exact pair")
    assert(exact.exceptAll(lsh).count() === 0, "LSH missed an exact pair")
  }

  test("crossNearDupPairs == union nearDupPairs restricted to cross pairs") {
    import spark.implicits._
    // split the real corpus into a "corpus" (doc_id < 400) and a "new
    // batch" (doc_id >= 400); incremental cross pairs must equal the
    // full union run filtered to pairs straddling the split — and must
    // contain NO corpus-internal pair. Detached forms + release: the
    // shared session must not accumulate signature caches (the same leak
    // class the Decontaminate review fixed).
    val docs = Tables.documents(spark, sf0001)
    val corpus = docs.filter($"doc_id" < 400)
    val fresh = docs.filter($"doc_id" >= 400)
    val (cross, releaseCross) = MinHashLsh.crossNearDupPairsDetached(
      fresh, corpus, "doc_id", "text", threshold = 0.5)
    val (full, releaseFull) = MinHashLsh.nearDupPairsDetached(
      docs, "doc_id", "text", threshold = 0.5)
    try {
      // nearDupPairs emits i < j, so a straddling pair surfaces as
      // (i = corpus id, j = new id); normalize to (new, corpus)
      val want = full.filter($"i" < 400 && $"j" >= 400)
        .select($"j".as("i"), $"i".as("j"), $"jaccard")
      // compute the diffs once; the failure clue must not re-run jobs on
      // the green path
      val missed = want.exceptAll(cross).count()
      val spurious = cross.exceptAll(want).count()
      assert(missed === 0 && spurious === 0,
        s"$missed straddling pairs missed, $spurious spurious")
      assert(cross.count() > 0, "split should straddle at least one near-dup")
      assert(cross.filter($"i" < 400 || $"j" >= 400).count() === 0)

      // amortized path: a precomputed persisted corpus signature table
      // yields the identical pair set
      val corpSigs = MinHashLsh.signatures(corpus, "doc_id", "text").persist()
      val (prepared, releaseNew) = MinHashLsh.crossNearDupPairsPrepared(
        fresh, corpSigs, "doc_id", "text", threshold = 0.5)
      try {
        assert(prepared.exceptAll(cross).isEmpty && cross.exceptAll(prepared).isEmpty)
      } finally { releaseNew(); corpSigs.unpersist() }
    } finally { releaseCross(); releaseFull() }
  }

  test("nearDupPairsFromSigs — shuffled default ≡ broadcast form (ADVICE r10)") {
    // the broadcastCandidates knob changes only the verify-join PLAN
    // (batch-bounded callers broadcast; the corpus-scale default must
    // not) — the emitted pair set is identical either way
    val docs = Tables.documents(spark, sf0001)
    val sigs = MinHashLsh.signatures(docs, "doc_id", "text").persist()
    try {
      val shuffled = MinHashLsh.nearDupPairsFromSigs(sigs, threshold = 0.5)
      val bcast = MinHashLsh.nearDupPairsFromSigs(sigs, threshold = 0.5,
        broadcastCandidates = true)
      assert(shuffled.exceptAll(bcast).isEmpty &&
        bcast.exceptAll(shuffled).isEmpty,
        "broadcast and shuffled verify plans must emit identical pairs")
      assert(bcast.count() > 0, "corpus should contain at least one pair")
    } finally { sigs.unpersist(); () }
  }

  test("signature determinism across partition layouts") {
    val docs = Tables.documents(spark, sf0001)
    def sigs(parts: Int) = docs.repartition(parts)
      .select(col("doc_id"),
        MinHashLsh.signature(
          transform(array_distinct(
            graft.functions.TextOps.shingles(
              graft.functions.TextOps.tokens(col("text")), 3)),
            MinHashLsh.shingleHash28(_)), 8).as("sig"))
    val a = sigs(2)
    val b = sigs(7)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("hash params are deterministic and in range") {
    val p1 = MinHashLsh.params(48)
    val p2 = MinHashLsh.params(48)
    assert(p1 === p2)
    assert(p1.forall { case (a, b) =>
      a >= 1 && a < 2147483647L && b >= 0 && b < 2147483647L })
  }
}
