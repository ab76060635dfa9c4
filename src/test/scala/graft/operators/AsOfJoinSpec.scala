package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** As-of join operator: strict/non-strict semantics on hand-built rows, and
  * equivalence with the q12 window formulation on the real events corpus.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("strict vs non-strict at equal timestamps") {
    val left = Seq((1L, ts("2026-01-01 10:00:00"), "p1"))
      .toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts("2026-01-01 09:00:00"), 100L),
      (1L, ts("2026-01-01 10:00:00"), 200L), // same instant as the probe
      (1L, ts("2026-01-01 11:00:00"), 300L))
      .toDF("user_id", "ts", "v")
    val strict = AsOfJoin.join(left, right, Seq("user_id"), "ts", "ts",
      Seq("v"), strict = true).select("tag", "asof_v").as[(String, Long)].head()
    val loose = AsOfJoin.join(left, right, Seq("user_id"), "ts", "ts",
      Seq("v"), strict = false).select("tag", "asof_v").as[(String, Long)].head()
    assert(strict === ("p1", 100L)) // strictly earlier
    assert(loose === ("p1", 200L))  // equal timestamp admitted
  }

  test("latest right row with a null value attaches as null, not a stale row") {
    // regression: per-column attachment with last(ignoreNulls) used to fall
    // back to an OLDER right row when the latest value was null — the
    // struct payload must keep the right ROW atomic
    val left = Seq((1L, ts("2026-01-01 12:00:00"), "p"))
      .toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts("2026-01-01 09:00:00"), Some(5L), Some("old")),
      (1L, ts("2026-01-01 10:00:00"), None, Some("new"))) // latest: v is null
      .toDF("user_id", "ts", "v", "w")
    val out = AsOfJoin.join(left, right, Seq("user_id"), "ts", "ts",
      Seq("v", "w")).select("asof_v", "asof_w").head()
    assert(out.isNullAt(0), "stale v from the older row leaked through")
    assert(out.getString(1) === "new") // both columns from the SAME (latest) row
  }

  test("no earlier right row → null attach; keys never cross") {
    val left = Seq((1L, ts("2026-01-01 08:00:00"), "early"),
                   (2L, ts("2026-01-01 12:00:00"), "other-key"))
      .toDF("user_id", "ts", "tag")
    val right = Seq((1L, ts("2026-01-01 09:00:00"), 1L))
      .toDF("user_id", "ts", "v")
    val out = AsOfJoin.join(left, right, Seq("user_id"), "ts", "ts", Seq("v"))
      .select("tag", "asof_v").collect()
    assert(out.forall(_.isNullAt(1))) // key 1 too early, key 2 has no rights
  }

  test("duplicate right (key, ts) rows attach deterministically (ADVICE r1)") {
    // two right rows at the identical key+timestamp: the winner must be
    // pinned by the payload tie-break (greatest payload struct), not by
    // partition layout. Run over several input layouts and demand one answer.
    val left = Seq((1L, ts("2026-01-01 12:00:00"), "p"))
      .toDF("user_id", "ts", "tag")
    val dupes = Seq(
      (1L, ts("2026-01-01 10:00:00"), 7L, "b"),
      (1L, ts("2026-01-01 10:00:00"), 7L, "a"),
      (1L, ts("2026-01-01 10:00:00"), 3L, "z"))
    val winners = (1 to 4).map { n =>
      val right = dupes.toDF("user_id", "ts", "v", "w").repartition(n)
      AsOfJoin.join(left, right, Seq("user_id"), "ts", "ts", Seq("v", "w"))
        .select("asof_v", "asof_w").as[(Long, String)].head()
    }.toSet
    assert(winners === Set((7L, "b"))) // greatest (v, w) payload, every layout
  }

  test("operator equals the q12 window formulation on events (sf0.001)") {
    val events = Tables.events(spark, sf0001)
    val purchases = events.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val signups = events.filter($"event_type" === "signup")
      .select($"user_id", $"ts", $"ts".as("signup_ts"))
    val viaOp = AsOfJoin.join(purchases, signups, Seq("user_id"), "ts", "ts",
        Seq("signup_ts"), strict = true)
      .select($"event_id", unix_micros($"asof_signup_ts").as("signup_us"))
    val viaWindow = graft.queries.Catalog.byName("q12_asof").build(spark, sf0001)
      .select($"event_id", $"signup_us")
    assert(viaOp.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaOp).isEmpty)
  }
}
