package graft.etl

/** Shared rotating-seed fuzz discipline (r17, VERDICT r16 #3).
  *
  * The r16 lesson: a committed seeded fuzzer is a REGRESSION test, not
  * a search — re-running it under a handful of ALTERNATE seeds is cheap
  * and found a real shipped bug (the RC4-bit-flip-in-a-deflate-literal
  * CRC hole) that the pinned seed missed. Institutionalized here:
  *
  *   - every structural fuzzer runs [[SeedCount]] seeds per suite run:
  *     the PINNED base seed always (the anchor that covers the historic
  *     bug classes — deterministic regression value), plus rotating
  *     seeds derived from the base and the UTC epoch-day, so each day's
  *     suite run explores fresh mutation space while any given run
  *     stays reproducible (the failure message names the seed);
  *   - case budget is divided across the seeds so suite time stays flat
  *     vs the single-seed r16 shape;
  *   - properties use `forAllNoShrink` — ScalaCheck shrinking on
  *     Array[Byte] counterexamples runs tens of minutes and destroys
  *     the structural label anyway; instead the failing MUTANT is
  *     dumped to a file (the STATE lesson) so the exact bytes replay.
  */
private[etl] object FuzzHarness {

  val SeedCount = 3

  /** The pinned base first, then `SeedCount - 1` day-rotated seeds.
    * Derivation is `base + epochDay * (SeedCount - 1) + k`, so
    * consecutive days never repeat a rotated seed and no rotated seed
    * ever collides with the base (epochDay > 0 since 1970).
    */
  def rotatingSeeds(base: Long): Seq[Long] = {
    val day = java.time.LocalDate.now(java.time.ZoneOffset.UTC).toEpochDay
    base +: (1 until SeedCount).map(k => base + day * (SeedCount - 1) + k)
  }

  /** Dump a failing mutant's exact bytes for replay; returns the path.
    * Files land under the build's target dir (survives the run, never
    * committed).
    */
  def dumpMutant(family: String, label: String, bytes: Array[Byte]): String = {
    val dir = new java.io.File("target/fuzz-failures")
    dir.mkdirs()
    val safe = label.replaceAll("[^A-Za-z0-9@_.-]", "_")
    val f = new java.io.File(dir, s"$family-$safe.bin")
    val out = new java.io.FileOutputStream(f)
    try out.write(bytes) finally out.close()
    f.getPath
  }

  /** Run `prop` once per rotating seed with the per-seed case budget;
    * fail naming the seed so the run replays exactly.
    */
  def checkRotating(base: Long, casesPerSeed: Int,
                    prop: org.scalacheck.Prop): Unit = {
    import org.scalacheck.{Test => ScTest}
    rotatingSeeds(base).foreach { seed =>
      val res = ScTest.check(ScTest.Parameters.default
        .withMinSuccessfulTests(casesPerSeed)
        .withInitialSeed(org.scalacheck.rng.Seed(seed)), prop)
      assert(res.passed,
        s"property failed under seed $seed (base $base): ${res.status}; " +
          "failing mutants are dumped under target/fuzz-failures/")
    }
  }
}
