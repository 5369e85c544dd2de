package graft

/** Guards the gate registry itself: the per-module query maps merge
  * with `++`, so a key reused across modules silently SHADOWS the
  * earlier gate (caught live in round 11: a second `mad_outliers`
  * replaced the original and the board shrank by one with every
  * check still green). */
class RegistrySpec extends org.scalatest.funsuite.AnyFunSuite {

  private val modules = Seq(
    "Core" -> (graft.queries.CoreQueries.queries.keySet,
      graft.queries.CoreQueries.oracleSql.keySet),
    "Analytics" -> (graft.queries.AnalyticsQueries.queries.keySet,
      graft.queries.AnalyticsQueries.oracleSql.keySet),
    "Ext" -> (graft.queries.ExtQueries.queries.keySet,
      graft.queries.ExtQueries.oracleSql.keySet),
    "Pipeline" -> (graft.queries.PipelineQueries.queries.keySet,
      graft.queries.PipelineQueries.oracleSql.keySet),
    "Relational" -> (graft.queries.RelationalQueries.queries.keySet,
      graft.queries.RelationalQueries.oracleSql.keySet),
    "Corpus" -> (graft.queries.CorpusQueries.queries.keySet,
      graft.queries.CorpusQueries.oracleSql.keySet),
    "Lake" -> (graft.queries.LakeQueries.queries.keySet,
      graft.queries.LakeQueries.oracleSql.keySet),
    "Train" -> (graft.queries.TrainQueries.queries.keySet,
      graft.queries.TrainQueries.oracleSql.keySet),
    "Tpch" -> (graft.queries.TpchQueries.queries.keySet,
      graft.queries.TpchQueries.oracleSql.keySet))

  test("no query key is defined by two modules (merge would shadow)") {
    val all = modules.flatMap { case (m, (q, _)) => q.map(_ -> m) }
    val dups = all.groupBy(_._1).filter(_._2.size > 1)
      .map { case (k, v) => s"$k(${v.map(_._2).mkString("+")})" }
    assert(dups.isEmpty, s"shadowed keys: $dups")
    assert(modules.map(_._2._1.size).sum ==
      graft.SparkEntry.queries.size)
  }

  test("every gated query has an oracle and vice versa, per module " +
      "and merged") {
    for ((m, (q, o)) <- modules)
      assert(q == o, s"$m: queries vs oracles differ: " +
        s"q-o=${q -- o} o-q=${o -- q}")
    assert(graft.SparkEntry.queries.keySet ==
      graft.SparkEntry.oracleSql.keySet)
  }
}
