package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.functions.col

import graft.ext.Scoring
import graft.ext.Scoring.{StubScorer, TextScorer}

/** The seam mechanics a real classifier relies on: one scorer instance
  * per partition, batches capped at batchSize, positional score/id
  * zip, stub determinism. */
class ScoringSpec extends SparkSpec {
  import spark.implicits._

  test("stub score is the md5-top-32 dyadic probability") {
    val out = Scoring.scoreDocuments(
      Seq((1L, "hello world")).toDF("doc_id", "text"),
      col("doc_id"), col("text")).collect().head
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("hello world".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val want = java.lang.Long.parseLong(hex.take(8), 16).toDouble /
      4294967296.0
    assert(out.score == want)
    assert(out.label == (if (want >= 0.5) "keep" else "drop"))
  }

  test("scorer inits once per partition and sees bounded batches") {
    val df = (1L to 100L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
      .repartition(4)
    val batches = ScoringSpec.observed
    batches.clear()
    val out = Scoring.scoreDocuments(df, col("doc_id"), col("text"),
      newScorer = () => new ScoringSpec.ObservingScorer,
      batchSize = 8).collect()
    assert(out.length == 100)
    val sizes = batches.toArray(Array.empty[Integer]).map(_.toInt)
    assert(sizes.forall(_ <= 8), s"oversized batch in ${sizes.toSeq}")
    assert(sizes.sum == 100)
    // 4 partitions x ceil(25/8)=4 batches => >= 4 distinct init markers
    assert(ScoringSpec.inits.size() == 4,
      s"expected 4 per-partition inits, saw ${ScoringSpec.inits.size()}")
  }

  test("hashed-linear scorer: bounded score, threshold label, determinism") {
    val s = new Scoring.HashedLinearScorer()
    val texts = Seq("the quick brown fox", "  spaced   out  ", "x")
    val a = s.scoreBatch(texts)
    val b = s.scoreBatch(texts)
    assert(a == b) // stateless across calls
    a.foreach { case (score, label) =>
      assert(score >= -1.0 && score <= 1.0)
      assert(label == (if (score >= 0) "keep" else "drop"))
    }
  }

  test("scores stay zipped to their ids across batches") {
    val df = (1L to 50L).map(i => (i, i.toString)).toDF("doc_id", "text")
      .repartition(3)
    val got = Scoring.scoreDocuments(df, col("doc_id"), col("text"),
      batchSize = 7).collect()
    val direct = new StubScorer().scoreBatch((1L to 50L).map(_.toString))
    val byId = got.map(s => s.doc_id -> s.score).toMap
    (1L to 50L).foreach { i =>
      assert(byId(i) == direct(i.toInt - 1)._1, s"score miszip at id $i")
    }
  }
}

object ScoringSpec {
  // static (JVM-shared): visible across local-mode task threads
  val observed = new ConcurrentLinkedQueue[Integer]()
  val inits = new ConcurrentLinkedQueue[Integer]()

  final class ObservingScorer extends TextScorer {
    ScoringSpec.inits.add(1)
    private val stub = new StubScorer()
    def scoreBatch(texts: Seq[String]): Seq[(Double, String)] = {
      ScoringSpec.observed.add(texts.length)
      stub.scoreBatch(texts)
    }
  }
}
