package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational / analytics queries (SURVEY.md §2.2) — the batch workloads a
  * MapleJuice user runs, declared via DataFrame so Catalyst gets pushdown,
  * join reorder, partial agg and AQE. Every aggregate column is aliased
  * identically to the DuckDB oracle in [[oracle]].
  *
  * Scale notes per query are inline; dims (region/nation/supplier) are
  * broadcast explicitly, fact-fact joins shuffle on their keys.
  */
object Relational {

  private def ts(s: String) = to_timestamp(lit(s))

  /** TPC-H Q1-style pricing summary: single scan, map-side partial agg,
    * tiny shuffle (|flags|×|statuses| groups). Filter pushed to parquet.
    */
  def q1PricingSummary(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .filter(col("l_shipdate") <= ts("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q3-style: filtered customer ⋈ orders ⋈ lineitem, top-10 by
    * revenue. customer/orders prefiltered so AQE can broadcast the small
    * side; lineitem shuffles once on l_orderkey.
    */
  def q3ShippingPriority(spark: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(spark, d).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, d).filter(col("o_orderdate") < ts("1999-01-01"))
    val l = Tables.lineitem(spark, d).filter(col("l_shipdate") > ts("1999-01-01"))
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style: revenue per nation. region/nation/supplier are true
    * dims — broadcast them; lineitem⋈orders is the only big shuffle.
    */
  def q5RevenueByNation(spark: SparkSession, d: String): DataFrame = {
    val r = Tables.region(spark, d).filter(col("r_name") === "ASIA")
    val n = Tables.nation(spark, d)
    val s = Tables.supplier(spark, d)
    val c = Tables.customer(spark, d)
    val o = Tables.orders(spark, d)
      .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1998-01-01"))
    val l = Tables.lineitem(spark, d)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Join + agg + HAVING: customers with ≥5 orders by total spend. */
  def qTopCustomers(spark: SparkSession, d: String): DataFrame =
    Tables.customer(spark, d)
      .join(Tables.orders(spark, d), col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(round(sum(col("o_totalprice")), 2).as("total_spent"), count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= 5)
      .orderBy(col("total_spent").desc, col("c_custkey"))
      .limit(20)

  /** EXISTS → left-semi join (TPC-H Q4-style): no row multiplication, the
    * semi join short-circuits per key.
    */
  def qOrdersWithLineitems(spark: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(spark, d)
      .filter(col("o_orderdate") >= ts("1997-01-01") && col("o_orderdate") < ts("1997-04-01"))
    val l = Tables.lineitem(spark, d)
    o.join(l, col("l_orderkey") === col("o_orderkey") && col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** NOT EXISTS → left-anti join: parts with no shipment in the window. */
  def qPartsNeverOrdered(spark: SparkSession, d: String): DataFrame = {
    val recent = Tables.lineitem(spark, d).filter(col("l_shipdate") >= ts("2001-10-01"))
    Tables.part(spark, d)
      .join(recent, col("l_partkey") === col("p_partkey"), "left_anti")
      .select(col("p_partkey"), col("p_name"))
      .orderBy(col("p_partkey"))
  }

  /** Window functions: running quantity per supplier. One shuffle on
    * l_suppkey, sort within partitions — no global sort until the final
    * (presentation) orderBy.
    *
    * The window order includes l_quantity as the last tie-breaker: the
    * synthetic lineitem has duplicate (l_orderkey, l_linenumber) keys,
    * and without a TOTAL order on the summed column the running sums are
    * engine-sort-order-dependent (observed as a flaky one-cell oracle
    * mismatch at sf0.1). With quantity in the order, rows that still tie
    * are identical in every projected column, so the output multiset is
    * deterministic.
    */
  def qRunningTotals(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    Tables.lineitem(spark, d)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate"), col("l_quantity"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("running_qty",
        round(sum(col("l_quantity")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("rn"), col("running_qty"))
      .orderBy(col("l_suppkey"), col("rn"))
  }

  /** dense_rank over an aggregate: suppliers ranked by revenue.
    *
    * Scale: `Window.orderBy` with no partitionBy funnels every row through
    * one task — at millions of suppliers that's the classic single-task
    * bottleneck. Instead compute dense_rank distributively, IN ONE PLAN
    * over the supplier rows themselves: (1) range-partition the aggregated
    * relation by revenue desc (equal values land in one partition, so a
    * local dense_rank is globally consistent), (2) dense_rank within each
    * partition, (3) add per-partition offsets — the cumulative count of
    * distinct revenues in lower partitions, where each partition's
    * distinct count is simply its max local dense_rank. The only
    * single-task window runs over |partitions| rows, and the offsets join
    * back is a broadcast on the int partition id.
    *
    * Robustness (ADVICE r2): the previous formulation joined ranks back
    * to the aggregate on the double-typed `revenue` itself, so a bitwise
    * divergence between two evaluations of the FP-order-sensitive sum
    * could silently drop or misrank suppliers. Here rank is computed
    * alongside the full row — no join ever compares a floating-point
    * value, so a recomputed branch can shift a boundary rank by at most
    * the divergence in the value itself (already bounded by the
    * round(...,2)), never drop a row. The offsets are derived from the
    * ranked branch (max lrank per pid), not from a second scan of `rev`.
    */
  def qRankSuppliers(spark: SparkSession, d: String): DataFrame = {
    val rev = Tables.supplier(spark, d)
      .join(Tables.lineitem(spark, d), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
    // localCheckpoint: the range partitioner's boundaries come from a
    // nondeterministic SAMPLE of rev, and `parted` feeds two consumers
    // (the offsets aggregate and the final join) — materializing the pid
    // assignment once makes both observe identical boundaries regardless
    // of spark.sql.exchangeReuseEnabled or a stage retry (ADVICE r3).
    // Cost: |suppliers-with-sales| aggregated rows, tiny at any scale.
    val parted = rev.repartitionByRange(col("revenue").desc)
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val local = parted.withColumn("lrank",
      dense_rank().over(Window.partitionBy(col("pid")).orderBy(col("revenue").desc)).cast("long"))
    val offsets = local.groupBy(col("pid")).agg(max(col("lrank")).as("cnt"))
      .withColumn("offset",
        coalesce(sum(col("cnt")).over(
          Window.orderBy(col("pid")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("pid"), col("offset"))
    local.join(broadcast(offsets), Seq("pid"))
      .select(col("s_suppkey"), col("s_name"), col("revenue"),
        (col("offset") + col("lrank")).as("drank"))
      .orderBy(col("drank"), col("s_suppkey"))
  }

  /** ROLLUP: multi-level aggregation in one pass. */
  def qRollupSales(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_extendedprice")), 2).as("sum_price"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** CUBE: all 2ⁿ grouping combinations in one pass (ROLLUP's superset —
    * adds the (∅, linestatus) margin). Spark expands grouping sets before
    * the aggregate, so partial aggregation still combines map-side.
    */
  def qCubeSales(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_extendedprice")), 2).as("sum_price"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Exact distinct per group (at 100 TB prefer q_approx_distinct). */
  def qDistinctUsers(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  /** HLL sketch distinct — the scale path (no exact oracle by design). */
  def qApproxDistinct(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"))
      .orderBy(col("event_type"))

  /** Sketch-accuracy verdict for [[qApproxDistinct]] — the containment-
    * oracle pattern (VERDICT r5 #7) applied to HLL: the sketch output
    * itself is algorithm-defined (no SQL oracle), but its CONTRACT is
    * checkable — every group's estimate within `tol` of the exact
    * distinct count (rsd 0.01 ⇒ 5% is a generous ceiling). One row of
    * invariants the DuckDB oracle reproduces from the exact side alone;
    * an estimator regression hash-mismatches it.
    */
  def qApproxDistinctCheck(spark: SparkSession, d: String, tol: Double = 0.05): DataFrame =
    Tables.events(spark, d)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id"), 0.01).as("approx"))
      .agg(count(lit(1)).as("n_groups"),
        coalesce(sum(when(
          abs(col("approx") - col("exact")) > lit(tol) * col("exact"), 1L).otherwise(0L)),
          lit(0L)).as("n_outside_tol"))
      .select(col("n_groups"), col("n_outside_tol"),
        (col("n_outside_tol") === 0).as("all_within"))

  /** Sketch-accuracy verdict for [[qApproxPercentiles]], checked in
    * RANK space — the digest's actual contract. The sketch returns a
    * data ELEMENT within rank error accuracy⁻¹ (1e-4) of the target
    * percentile, while the exact twin linearly interpolates; comparing
    * the two in value space fails on small groups where one
    * inter-element gap exceeds any sensible relative tolerance (seen at
    * sf0.001). The element the sketch may legally return always lies
    * between the interpolated quantiles at p ± (1/n_group + 1e-4), so
    * the check brackets each estimate with exact quantiles one
    * `rankSlack` away: 0.01 covers the smallest driver-SF group (~120
    * rows) with the digest's 1e-4 to spare. The 1e-6 margin absorbs the
    * 6dp rounding both twins apply.
    */
  def qApproxPercentilesCheck(spark: SparkSession, d: String,
                              rankSlack: Double = 0.01): DataFrame = {
    def q(p: Double) = round(expr(s"percentile(value, $p)"), 6)
    val bounds = Tables.events(spark, d).groupBy(col("event_type")).agg(
      q(0.50 - rankSlack).as("lo50"), q(0.50 + rankSlack).as("hi50"),
      q(0.95 - rankSlack).as("lo95"), q(0.95 + rankSlack).as("hi95"),
      q(0.99 - rankSlack).as("lo99"), q(math.min(1.0, 0.99 + rankSlack)).as("hi99"))
    val off = (a: Column, lo: Column, hi: Column) =>
      when(a < lo - lit(1e-6) || a > hi + lit(1e-6), 1L).otherwise(0L)
    bounds.join(qApproxPercentiles(spark, d), "event_type")
      .agg(count(lit(1)).as("n_groups"),
        coalesce(sum(
          off(col("p50"), col("lo50"), col("hi50")) +
          off(col("p95"), col("lo95"), col("hi95")) +
          off(col("p99"), col("lo99"), col("hi99"))), lit(0L)).as("n_outside_tol"))
      .select(col("n_groups"), col("n_outside_tol"),
        (col("n_outside_tol") === 0).as("all_within"))
  }

  /** Semi-structured: JSON field extraction from events.props + agg. */
  def qEventsEnriched(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("double"))
      .groupBy(col("event_type"))
      .agg(round(sum(col("value")), 2).as("total_value"), round(avg(col("k")), 4).as("avg_k"))
      .orderBy(col("event_type"))

  /** AS-OF join: each purchase matched to the same user's most recent
    * click at or before it — the temporal join Spark has no native
    * operator for. A naive formulation (range-predicate join + max) is a
    * BroadcastNestedLoop / O(clicks·purchases) blowup per user; this is
    * the UNION-TAG formulation: pour both sides into one relation,
    * window by user ordered by (ts, side), and carry the last click
    * forward with `last(..., ignoreNulls)`. ONE shuffle on user_id,
    * frame-bounded memory, no pair explosion — the scale-correct as-of
    * shape. Ordering puts a click BEFORE a purchase at equal ts, giving
    * the inclusive (`ts_click <= ts_purchase`) match DuckDB's ASOF JOIN
    * defines; with no prior click the match columns are NULL (left
    * semantics). Ties (two clicks, same user, same ts) would make any
    * as-of nondeterministic — the events table has none at any SF.
    */
  def qAsofJoin(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"), col("value"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_type"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .withColumn("last_click_ts",
        last(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(w))
      .withColumn("last_click_value",
        last(when(col("event_type") === "click", col("value")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("last_click_ts"), col("last_click_value"))
      .orderBy(col("event_id"))
  }

  /** Banded RANGE join: every (purchase, click-from-same-user-within-the-
    * hour-before) pair. Spark plans a raw range predicate as a
    * BroadcastNestedLoop / per-user cross product; the scalable shape is
    * INTERVAL BUCKETING: align clicks to 1-hour buckets, have each
    * purchase probe its own and the previous bucket (any click within
    * the band lives in one of the two), equi-join on (user, bucket), and
    * post-filter the exact band. The join becomes a hash join whose cost
    * tracks true match density instead of the cross product; each pair
    * is found exactly once (a click sits in one bucket).
    */
  def qRangeJoin(spark: SparkSession, d: String): DataFrame = {
    val BandUs = 3600L * 1000 * 1000
    val ev = Tables.events(spark, d)
    val bucketOf = (t: Column) => floor(unix_micros(t) / BandUs)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"),
        bucketOf(col("ts")).as("bucket"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts"),
        explode(array(bucketOf(col("ts")), bucketOf(col("ts")) - 1)).as("bucket"))
    purchases.join(clicks, Seq("user_id", "bucket"))
      .filter(col("click_ts") >= col("ts") - expr("INTERVAL 1 HOUR") &&
        col("click_ts") < col("ts"))
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        (unix_micros(col("ts")) - unix_micros(col("click_ts"))).as("gap_us"))
      .orderBy(col("purchase_id"), col("click_id"))
  }

  /** Exact grouped percentiles (linear interpolation, the quantile_cont
    * contract). Exact percentile sorts each group — fine per event_type
    * here; at 100 TB swap `percentile` for `approx_percentile(value, p,
    * accuracy)` (t-digest-style mergeable sketch, map-side combinable,
    * no group sort) the same way q_distinct_users pairs with
    * q_approx_distinct. The sketch variant has no exact oracle, so the
    * oracle-checked row is the exact form.
    */
  def qPercentiles(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.95)"), 6).as("p95"),
        round(expr("percentile(value, 0.99)"), 6).as("p99"))
      .orderBy(col("event_type"))

  /** Sketch percentiles — the 100 TB path [[qPercentiles]] documents:
    * `approx_percentile` keeps a bounded mergeable digest per group
    * (map-side combinable, no per-group sort). No exact oracle by
    * design (sketch output depends on the algorithm), so the driver
    * records rows-only; the exact row is the oracle-checked twin —
    * the same pairing as q_distinct_users / q_approx_distinct.
    */
  def qApproxPercentiles(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .groupBy(col("event_type"))
      .agg(
        round(expr("approx_percentile(value, 0.5, 10000)"), 6).as("p50"),
        round(expr("approx_percentile(value, 0.95, 10000)"), 6).as("p95"),
        round(expr("approx_percentile(value, 0.99, 10000)"), 6).as("p99"))
      .orderBy(col("event_type"))

  /** Range partitioning (the reference's range_partitioner,
    * /root/reference/src/partitioner.cpp:58-80) is exactly how Spark
    * executes a global ORDER BY: sample → range boundaries → shuffle →
    * in-partition sort.
    */
  def qGlobalSortTop(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> q1PricingSummary,
    "q3_shipping_priority" -> q3ShippingPriority,
    "q5_revenue_by_nation" -> q5RevenueByNation,
    "q_top_customers" -> qTopCustomers,
    "q_orders_with_lineitems" -> qOrdersWithLineitems,
    "q_parts_never_ordered" -> qPartsNeverOrdered,
    "q_running_totals" -> qRunningTotals,
    "q_rank_suppliers" -> qRankSuppliers,
    "q_rollup_sales" -> qRollupSales,
    "q_cube_sales" -> qCubeSales,
    "q_distinct_users" -> qDistinctUsers,
    "q_approx_distinct" -> qApproxDistinct,
    "q_events_enriched" -> qEventsEnriched,
    "q_asof_join" -> qAsofJoin,
    "q_range_join" -> qRangeJoin,
    "q_percentiles" -> qPercentiles,
    "q_approx_percentiles" -> qApproxPercentiles,
    "q_approx_distinct_check" -> ((s, d) => qApproxDistinctCheck(s, d)),
    "q_approx_percentiles_check" -> ((s, d) => qApproxPercentilesCheck(s, d)),
    "mj_partition_range" -> qGlobalSortTop)

  /** The band-join oracle, shared with the streaming formulation
    * (`stream_stream_join` must converge to exactly this relation). Band
    * predicates compare the µs-truncated ts, matching Spark's loaders.
    */
  val rangeJoinOracle: String =
    """WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events WHERE event_type = 'click')
      |SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
      | CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us
      |FROM p JOIN c
      | ON p.user_id = c.user_id
      | AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
      |ORDER BY purchase_id, click_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        | round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
        | round(avg(l_quantity),4) AS avg_qty,
        | round(avg(l_extendedprice),4) AS avg_price,
        | round(avg(l_discount),6) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        | AND l_orderkey = o_orderkey
        | AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        | AND l_shipdate > TIMESTAMP '1999-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_revenue_by_nation" ->
      """SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        | AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        | AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        | AND r_name = 'ASIA'
        | AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        | AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q_top_customers" ->
      """SELECT c_custkey, c_name, round(sum(o_totalprice),2) AS total_spent,
        | count(*) AS n_orders
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name HAVING count(*) >= 5
        |ORDER BY total_spent DESC, c_custkey LIMIT 20""".stripMargin,
    "q_orders_with_lineitems" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        | AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        | AND EXISTS (SELECT 1 FROM lineitem
        |   WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_parts_never_ordered" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_partkey = p_partkey AND l_shipdate >= TIMESTAMP '2001-10-01 00:00:00')
        |ORDER BY p_partkey""".stripMargin,
    "q_running_totals" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        | CAST(row_number() OVER w AS BIGINT) AS rn,
        | round(sum(l_quantity) OVER (PARTITION BY l_suppkey
        |   ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_qty
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_suppkey
        |  ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity)
        |ORDER BY l_suppkey, rn""".stripMargin,
    "q_rank_suppliers" ->
      """SELECT s_suppkey, s_name, revenue,
        | CAST(dense_rank() OVER (ORDER BY revenue DESC) AS BIGINT) AS drank
        |FROM (SELECT s_suppkey, s_name,
        |   round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |  FROM supplier JOIN lineitem ON l_suppkey = s_suppkey
        |  GROUP BY s_suppkey, s_name)
        |ORDER BY drank, s_suppkey""".stripMargin,
    "q_rollup_sales" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_extendedprice),2) AS sum_price,
        | count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_cube_sales" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_extendedprice),2) AS sum_price,
        | count(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_distinct_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_events_enriched" ->
      """SELECT event_type, round(sum(value),2) AS total_value,
        | round(avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)),4) AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // join predicates compare the µs-truncated ts (CAST in the CTEs, not
    // just the projection): Spark's loaders truncate ns→µs up front, so
    // comparing raw TIMESTAMP_NS here could disagree on pairs within 1µs
    // of a boundary
    "q_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |  FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, p.ts,
        | c.ts AS last_click_ts, c.value AS last_click_value
        |FROM p ASOF LEFT JOIN c
        | ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,
    "q_range_join" -> rangeJoinOracle,
    "q_percentiles" ->
      """SELECT event_type,
        | round(quantile_cont(value, 0.5), 6) AS p50,
        | round(quantile_cont(value, 0.95), 6) AS p95,
        | round(quantile_cont(value, 0.99), 6) AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // sketch-accuracy verdicts: the invariants are reproduced from the
    // exact side alone — zero groups may sit outside tolerance
    "q_approx_distinct_check" ->
      """SELECT count(DISTINCT event_type) AS n_groups,
        | CAST(0 AS BIGINT) AS n_outside_tol, true AS all_within
        |FROM events""".stripMargin,
    "q_approx_percentiles_check" ->
      """SELECT count(DISTINCT event_type) AS n_groups,
        | CAST(0 AS BIGINT) AS n_outside_tol, true AS all_within
        |FROM events""".stripMargin,
    "mj_partition_range" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)
}
