package graft

import java.sql.Timestamp

import graft.sinks.MergeWriter
import graft.sinks.MergeWriter.MergeSpec
import org.apache.spark.sql.functions._

/** S12 MERGE semantics, traced against the reference's upsert SQL flavors:
  * plain overwrite (`ingest_v2.py:360-371`), coalesce-preserving
  * (`ingest_v2.py:372-374`), seen-window folds (`ingest_v2.py:195-222`),
  * and the conditional `where excluded.edited_at >= target.edited_at`
  * update (`sql/schema.sql:426-432`). */
class MergeWriterSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("insert + overwrite + coalesce-preserving + seen-window folds") {
    val existing = Seq(
      ("u1", "old title", "old pub", Some("old snip"), ts("2025-01-01 00:00:00"), ts("2025-01-05 00:00:00")),
      ("u2", "keep me", "pub2", None, ts("2025-01-02 00:00:00"), ts("2025-01-02 00:00:00"))
    ).toDF("url", "title", "publisher", "snippet", "first_seen", "last_seen")
    val batch = Seq(
      // updates u1: new title, NULL snippet must NOT clobber, window widens right
      ("u1", "new title", "new pub", None: Option[String], ts("2025-01-03 00:00:00"), ts("2025-01-09 00:00:00")),
      // brand new key
      ("u3", "fresh", "pub3", Some("s3"), ts("2025-01-04 00:00:00"), ts("2025-01-04 00:00:00"))
    ).toDF("url", "title", "publisher", "snippet", "first_seen", "last_seen")

    val out = MergeWriter.merge(existing, batch, MergeSpec(
      keys = Seq("url"),
      overwrite = Seq("title", "publisher"),
      coalescePreserving = Seq("snippet"),
      minOf = Seq("first_seen"),
      maxOf = Seq("last_seen")))
      .orderBy("url")
      .as[(String, String, String, Option[String], Timestamp, Timestamp)]
      .collect()

    assert(out(0) == (("u1", "new title", "new pub", Some("old snip"),
      ts("2025-01-01 00:00:00"), ts("2025-01-09 00:00:00"))))
    assert(out(1) == (("u2", "keep me", "pub2", None,
      ts("2025-01-02 00:00:00"), ts("2025-01-02 00:00:00"))))
    assert(out(2) == (("u3", "fresh", "pub3", Some("s3"),
      ts("2025-01-04 00:00:00"), ts("2025-01-04 00:00:00"))))
  }

  test("conditional update: excluded.edited_at >= target.edited_at") {
    val existing = Seq(
      ("k1", "v-old", ts("2025-06-10 00:00:00")),
      ("k2", "v-old", ts("2025-06-10 00:00:00"))
    ).toDF("k", "v", "edited_at")
    val batch = Seq(
      ("k1", "v-new", ts("2025-06-11 00:00:00")), // newer -> applies
      ("k2", "v-stale", ts("2025-06-01 00:00:00")) // older -> rejected whole-row
    ).toDF("k", "v", "edited_at")

    val out = MergeWriter.merge(existing, batch, MergeSpec(
      keys = Seq("k"), overwrite = Seq("v", "edited_at"),
      updateOnlyIfNewerBy = Some("edited_at")))
      .orderBy("k").as[(String, String, Timestamp)].collect()

    assert(out(0) == (("k1", "v-new", ts("2025-06-11 00:00:00"))))
    assert(out(1) == (("k2", "v-old", ts("2025-06-10 00:00:00"))))
  }

  test("conditional update: NULL timestamps never win (Postgres NULL >= x)") {
    val existing = Seq(
      ("k1", "v-old", Option(ts("2025-06-10 00:00:00"))),
      ("k2", "v-old", Option.empty[Timestamp])
    ).toDF("k", "v", "edited_at")
    val batch = Seq(
      ("k1", "v-null-ts", Option.empty[Timestamp]), // NULL excluded.ts -> no update
      ("k2", "v-new", Option(ts("2025-06-11 00:00:00"))) // NULL target.ts -> no update
    ).toDF("k", "v", "edited_at")
    val out = MergeWriter.merge(existing, batch, MergeSpec(
      keys = Seq("k"), overwrite = Seq("v", "edited_at"),
      updateOnlyIfNewerBy = Some("edited_at")))
      .orderBy("k").as[(String, String, Option[Timestamp])].collect()
    assert(out(0) == (("k1", "v-old", Some(ts("2025-06-10 00:00:00")))))
    assert(out(1) == (("k2", "v-old", None)))
  }

  test("intra-batch latest-wins dedup via batchOrder") {
    val existing = Seq(("k1", "orig", 1L)).toDF("k", "v", "seq")
    val batch = Seq(("k1", "first", 10L), ("k1", "last", 20L), ("k2", "only", 5L))
      .toDF("k", "v", "seq")
    val out = MergeWriter.merge(existing, batch, MergeSpec(
      keys = Seq("k"), overwrite = Seq("v", "seq"),
      batchOrder = Seq(col("seq").desc)))
      .orderBy("k").as[(String, String, Long)].collect()
    assert(out.toSeq == Seq(("k1", "last", 20L), ("k2", "only", 5L)))
  }

  test("mergeArticles keeps its reference semantics through MergeWriter") {
    val existing = Seq(
      ("cu1", "id1", "t1", "p1", Option.empty[String], Option(ts("2025-01-01 00:00:00")),
        ts("2025-01-01 00:00:00"), ts("2025-01-02 00:00:00"), "google_rss")
    ).toDF("canonical_url", "id", "title", "publisher", "snippet", "published_at",
      "first_seen_at", "last_seen_at", "source")
    val batch = Seq(
      ("cu1", "id1", "t1b", "p1b", Option.empty[String], Option.empty[Timestamp],
        ts("2025-01-05 00:00:00"), ts("2025-01-05 00:00:00"), "google_rss")
    ).toDF("canonical_url", "id", "title", "publisher", "snippet", "published_at",
      "first_seen_at", "last_seen_at", "source")
    val out = graft.ingest.ArticlesIngest.mergeArticles(existing, batch)
      .select("title", "publisher", "published_at", "first_seen_at", "last_seen_at")
      .as[(String, String, Option[Timestamp], Timestamp, Timestamp)].collect()
    // new title/publisher win; null published_at preserved the old one;
    // seen window widened right only
    assert(out.toSeq == Seq(("t1b", "p1b", Some(ts("2025-01-01 00:00:00")),
      ts("2025-01-01 00:00:00"), ts("2025-01-05 00:00:00"))))
  }
}
