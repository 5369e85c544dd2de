package graft

import org.apache.spark.sql.functions.col

import graft.ext.{Graph, Privacy}

/** [[graft.ext.Privacy]] and [[graft.ext.Graph.bfsDistances]] on
  * hand-computable inputs. */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  test("kAnonymityAudit: sizes, at-risk flag, suppression") {
    val df = Seq(
      ("a", "x"), ("a", "x"), ("a", "x"),
      ("b", "y"), ("b", "y"),
      ("c", "z")).toDF("q1", "q2")
    val out = Privacy.kAnonymityAudit(df, Seq(col("q1"), col("q2")), k = 3)
      .as[(String, String, Long, Boolean, Option[Long])]
      .collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      ("a", "x", 3L, false, Some(3L)),
      ("b", "y", 2L, true, None),
      ("c", "z", 1L, true, None)))
  }

  test("noisyCounts: deterministic bounded noise, clamped at zero") {
    val df = (1 to 5).map(i => s"g${i % 2}").toDF("g")
    val out = Privacy.noisyCounts(df, col("g"), bound = 10)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    out.foreach { case (_, n, noise, released) =>
      assert(noise >= -10 && noise <= 10)
      assert(released == math.max(n + noise, 0L))
    }
    // determinism: identical on a second run
    val again = Privacy.noisyCounts(df, col("g"), bound = 10)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == again.toSeq)
    // a different salt epoch redraws
    val other = Privacy.noisyCounts(df, col("g"), bound = 10, salt = "e2")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._2).toSeq == other.map(_._2).toSeq)
  }

  test("noisyCounts clamps a negative noisy count to zero") {
    // find a key whose noise is negative enough by scanning a few
    val df = (1 to 40).map(i => s"k$i").toDF("g") // 40 singleton groups
    val out = Privacy.noisyCounts(df, col("g"), bound = 10)
      .as[(String, Long, Long, Long)].collect()
    assert(out.exists(_._3 < -1), "expected some negative noise draws")
    out.filter(r => r._2 + r._3 < 0).foreach(r => assert(r._4 == 0L))
    out.foreach(r => assert(r._4 >= 0L))
  }

  test("bfsDistances: exact hop counts on a known graph") {
    // path 1-2-3-4-5-6 plus shortcut 1-4: seed=min=1
    // dist: 1->0, 2->1, 4->1, 3->2, 5->2, 6->3
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (1L, 4L)).toDF("a", "b")
    val out = Graph.bfsDistances(edges, col("a"), col("b"), hops = 4)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 1L),
      (5L, 2L), (6L, 3L)))
  }

  test("bfsDistances: hop cap excludes vertices beyond it") {
    val chain = (1L to 8L).sliding(2)
      .map(s => (s.head, s.last)).toSeq.toDF("a", "b")
    val out = Graph.bfsDistances(chain, col("a"), col("b"), hops = 3)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 3L)))
  }

  test("bfsDistances: min-dist wins when reached via multiple routes") {
    // triangle 1-2-3 plus pendant 3-4: 4 is at distance 2 (1->3->4)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val out = Graph.bfsDistances(edges, col("a"), col("b"), hops = 4)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 0L), (2L, 1L), (3L, 1L), (4L, 2L)))
  }
}
