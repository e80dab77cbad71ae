package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational analytics over the TPC-H-ish star schema — the "everything
  * else" a complete engine owes its users beyond the vector/sparse/text
  * surface: multi-way joins, broadcast dimension tables, analytic windows,
  * semi-structured JSON extraction.
  *
  * Money is aggregated in integer cents (floor(x * 100) per row, exact
  * integer sums) so results hash-compare deterministically.
  *
  * Scale notes: fact tables (lineitem, orders, events) only ever shuffle on
  * their join/group keys; dimension tables (region, nation, customer at
  * this schema's shape) are broadcast — verified by PlanSpec, which asserts
  * BroadcastHashJoin and parquet filter pushdown in the physical plans. */
object Relational {

  private def cents(c: org.apache.spark.sql.Column) =
    floor(c * 100).cast("long")

  /** Shipping-priority revenue (TPC-H Q3 shape): segment-filtered customers
    * × date-bounded orders × lineitem, revenue per open order. */
  def q3Revenue(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                segment: String, cutoff: String): DataFrame = {
    val c = customer.where(col("c_mktsegment") === segment)
    val o = orders.where(col("o_orderdate") < lit(cutoff).cast("timestamp"))
    val l = lineitem.where(col("l_shipdate") > lit(cutoff).cast("timestamp"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .as("revenue_cents"))
  }

  /** Regional revenue rollup (TPC-H Q5 shape): region → nation → customer →
    * orders → lineitem, revenue per nation. Region and nation are tiny and
    * broadcast; the join tree keeps the fact table's shuffle on orderkey
    * only. */
  def q5RegionRevenue(region: DataFrame, nation: DataFrame, customer: DataFrame,
                      orders: DataFrame, lineitem: DataFrame,
                      regionName: String): DataFrame = {
    val dims = broadcast(
      nation.join(region.where(col("r_name") === regionName),
        col("n_regionkey") === col("r_regionkey")))
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(dims, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .as("revenue_cents"),
        count(lit(1)).as("n_items"))
  }

  /** First-k events per user by event time (analytic window): the sessions/
    * funnel primitive. Deterministic tie-break on event_id. */
  def firstEventsPerUser(events: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events.withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= k)
      .select("user_id", "event_id", "event_type", "rn")
  }

  /** Top-n parts per brand by retail price (windowed ranking over a
    * dimension) — rank ties broken by partkey. */
  def topPartsPerBrand(part: DataFrame, n: Int): DataFrame = {
    val w = Window.partitionBy("p_brand")
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    part.withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= n)
      .select("p_brand", "p_partkey", "rn")
  }

  /** Semi-structured extraction: pull `k` out of the JSON props column and
    * aggregate per event type — the JSON path stays inside codegen
    * (get_json_object), no UDF. */
  def eventJsonStats(events: DataFrame): DataFrame =
    events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), sum("k").as("sum_k"), max("k").as("max_k"))
}
