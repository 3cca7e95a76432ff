package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The r10 fixture change (VERDICT r9 task 2) made q_incremental_cc /
  * q_incremental_cc_delete measure the INCREMENTAL path against
  * precomputed standing labels instead of paying full CC in-query. The
  * standing labels are analytic (the graphs are synthetic):
  *   - insert fixture (chain blocks of 50):  cluster_id = id - id%50
  *   - delete fixture (blocks paired by a 100k->100k+50 bridge):
  *     cluster_id = id - id%100
  * This spec pins those closed forms against the full StarComponents
  * labeling on the SAME graph construction, over an id range that
  * exercises both a bridged pair and a trailing UNPAIRED block (250 ids
  * = 5 blocks, bridges at 0 and 100 only — 200's partner 250 doesn't
  * exist), so a testdata resize or an off-by-one in the closed form
  * cannot silently decouple the bench fixture from the operator it
  * claims to measure.
  */
class IncrementalCcFixtureSpec extends SparkSpec {

  private def fixtureGraph(n: Int) = {
    val ids = spark.range(n).select(col("id"))
    val chain = ids.as("x")
      .join(ids.as("y"), col("y.id") === col("x.id") + 1)
      .filter(col("x.id") % 50 =!= 49)
      .select(col("x.id").as("a"), col("y.id").as("b"))
    val bridges = ids.as("x")
      .join(ids.as("y"), col("y.id") === col("x.id") + 50)
      .filter(col("x.id") % 100 === 0)
      .select(col("x.id").as("a"), col("y.id").as("b"))
    (ids, chain, bridges)
  }

  test("insert fixture: id - id%50 equals full CC over the chain graph") {
    val (ids, chain, _) = fixtureGraph(250)
    val analytic = ids.select(col("id"),
      (col("id") - col("id") % 50).as("cluster_id"))
    val full = StarComponents.connectedComponents(ids, chain)
    assert(analytic.except(full).isEmpty && full.except(analytic).isEmpty,
      "analytic standing labels diverge from full star-CC on the chain graph")
  }

  test("delete fixture: id - id%100 equals full CC over chain + bridges") {
    val (ids, chain, bridges) = fixtureGraph(250)
    val analytic = ids.select(col("id"),
      (col("id") - col("id") % 100).as("cluster_id"))
    val full = StarComponents.connectedComponents(ids, chain.unionByName(bridges))
    assert(analytic.except(full).isEmpty && full.except(analytic).isEmpty,
      "analytic standing labels diverge from full star-CC on chain+bridges")
    // the trailing block [200,249] is unpaired (no bridge at 200) and must
    // still label correctly: id - id%100 = 200 there
    val tail = full.filter(col("id") >= 200).select(col("cluster_id")).distinct()
      .collect().map(_.getLong(0)).toSeq
    assert(tail === Seq(200L))
  }
}
