package graft

class QueriesSpec extends SparkSpec {

  test("q1_agg returns grouped pricing summary") {
    val df = Queries.q1Agg(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(df.columns.toSeq == Seq(
      "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
      "sum_disc_price", "avg_qty", "avg_disc", "count_order"))
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val liCount = core.Tables.lineitem(spark, sf).count()
    assert(total == liCount)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
