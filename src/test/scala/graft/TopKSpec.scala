package graft

import org.apache.spark.sql.functions._

/** Exactness insurance for the one global-sort query: q_topk_orders breaks
  * price ties with o_orderkey, which must be a UNIQUE key for the sort to
  * be total (a partial order would make the driver's hash comparison
  * engine- and partitioning-dependent at scale). Pinned two ways: the key
  * really is unique in the data, and the query's rows equal a driver-side
  * reference sort over every column the oracle compares.
  */
class TopKSpec extends SparkSpec {

  test("q_topk_orders tie-break is total and matches a reference sort") {
    val dir = sf("0.01")
    val orders = spark.read.parquet(s"$dir/orders.parquet")

    val dupKeys = orders.groupBy("o_orderkey").count()
      .filter(col("count") > 1).count()
    assert(dupKeys === 0L, "o_orderkey must be unique for a total tie-break")

    // ties on the primary sort column must actually occur for the
    // tie-break to be load-bearing at this SF; if the data ever changes
    // to tie-free prices this pin degrades to a no-op, not a failure
    val all = orders.select("o_orderkey", "o_totalprice", "o_orderstatus")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    val expected = all.sortBy { case (k, p, _) => (-p, k) }.take(20).toSeq

    val got = graft.ops.GenericQueries.queries("q_topk_orders")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
    assert(got === expected)
  }
}
