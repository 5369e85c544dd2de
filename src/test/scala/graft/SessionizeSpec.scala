package graft

import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Sessionization + simhash-pair + composed-pipeline specs. */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("batch sessionize splits on the 10-minute gap, not before") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sess").toString
    // user 1: events at 0s, 599s (same session), 1200s (new session)
    Seq((1L, 0L), (1L, 599L), (1L, 1200L), (2L, 5L))
      .map { case (u, s) => (u, new java.sql.Timestamp(s * 1000)) }
      .toDF("user_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.queries.AnalyticsQueries.sessionize(spark, dir)
      .orderBy("user_id", "session_id")
      .select("user_id", "session_id", "n_events")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L, 2L), (1L, 1L, 1L), (2L, 0L, 1L)))
  }

  test("simhash near-dup pairs: exact dups at hamming 0, unrelated absent") {
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g h"),
      (3L, "q w r t y u i o p j k l")).toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDupPairs(docs, $"doc_id", $"text", maxBits = 2)
      .as[(Long, Long, Int)].collect()
    assert(pairs.exists { case (a, b, h) => a == 1L && b == 2L && h == 0 })
    assert(!pairs.exists { case (a, b, _) => a == 3L || b == 3L })
  }

  test("composed dedup pipeline keeps lowest id per duplicate cluster") {
    val base = ('a' to 'z').map(_.toString).mkString(" ")
    val docs = Seq(
      (10L, base),
      (11L, base),                        // exact dup of 10 -> canon pass
      (12L, base.split(" ").reverse.mkString(" ")), // reorder -> canon pass
      (13L, base + " zzz"),               // near dup -> lsh + jaccard
      (14L, "completely different words here now ok")).toDF("doc_id", "text")
    val kept = Dedup.dedupPipelineKept(docs, $"doc_id", $"text",
        n = 3, jaccardThreshold = 0.5)
      .as[Long].collect().sorted.toSeq
    assert(kept.contains(10L) && kept.contains(14L))
    assert(!kept.contains(11L) && !kept.contains(12L))
    assert(!kept.contains(13L)) // verified near-dup dropped
  }
}
