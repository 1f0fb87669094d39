package graft.queries

import org.apache.spark.sql.functions._

/** Relational surface (SURVEY.md §2.2-§2.5): filters/projections with
  * parquet pushdown, broadcast dimension joins, semi/anti joins (the
  * reference's scoping and cascade-delete patterns), derived counts,
  * pagination, ranking windows — over the TPC-H-ish driver tables.
  */
object RelationalQueries {

  /** A1/A2-style aggregation with map-side partial agg; filter + column
    * pruning reach the parquet scan. Sums rounded so the double fold order
    * (Spark partial+final vs DuckDB sequential) cannot flip the hash. */
  private val aggLineitem: QueryFn = (s, dir) =>
    table(s, dir, "lineitem")
      .where(col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val aggLineitemSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      |  round(avg(l_quantity), 6) AS avg_qty,
      |  count(*) AS count_order
      |FROM lineitem WHERE l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** J1: chunk->document->library FK chain becomes fact ⋈ broadcast dims
    * (reference: vector_db/vector_store.py:157-158). customer->nation->region
    * is the same N:1 chain; both dims broadcast — zero shuffle on the fact. */
  private val fkChainJoin: QueryFn = (s, dir) => {
    val cust = table(s, dir, "customer")
    val nat = table(s, dir, "nation")
    val reg = table(s, dir, "region")
    cust
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("c_acctbal")), 2).as("total_acctbal"))
      .orderBy(col("r_name"), col("n_name"))
  }

  private val fkChainJoinSql: String =
    """SELECT r_name, n_name, count(*) AS n_customers,
      |  round(sum(c_acctbal), 2) AS total_acctbal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  /** TPC-H Q3 shape: selective dim filters pushed down, two joins, top-10
    * by aggregated revenue (broadcast the filtered small sides). */
  private val topRevenue: QueryFn = (s, dir) => {
    val cust = table(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
    val ord = table(s, dir, "orders")
      .where(col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1997-06-01 00:00:00")))
    val li = table(s, dir, "lineitem")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("l_orderkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private val topRevenueSql: String =
    """SELECT l_orderkey,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
      |GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** J2/P2: scoping semi-join (reference: disk_store.py:348-351 keeps
    * chunks whose document is in the library). */
  private val semiJoin: QueryFn = (s, dir) => {
    val ord = table(s, dir, "orders")
    val bigCust = table(s, dir, "customer").where(col("c_acctbal") > 9000)
    ord.join(bigCust, ord("o_custkey") === bigCust("c_custkey"), "left_semi")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderstatus"))
  }

  private val semiJoinSql: String =
    """SELECT o_orderstatus, count(*) AS n_orders FROM orders
      |WHERE EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey AND c_acctbal > 9000)
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** J6: cascade delete as LEFT ANTI join (reference:
    * vector_db/vector_store.py:131-147 — deleting documents removes their
    * chunks; here: "delete" high-balance customers, orders survive only if
    * their parent was not deleted). */
  private val antiJoinCascade: QueryFn = (s, dir) => {
    val ord = table(s, dir, "orders")
    val deleted = table(s, dir, "customer").where(col("c_acctbal") > 9000)
    ord.join(deleted, ord("o_custkey") === deleted("c_custkey"), "left_anti")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_price"))
      .orderBy(col("o_orderpriority"))
  }

  private val antiJoinCascadeSql: String =
    """SELECT o_orderpriority, count(*) AS n_orders,
      |  round(sum(o_totalprice), 2) AS total_price
      |FROM orders
      |WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey AND c_acctbal > 9000)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** A2: derived counts replace the reference's stored counters
    * (reference: vector_db/entities.py:93-99 — counts can never drift when
    * they are a groupBy at read time). */
  private val derivedCounts: QueryFn = (s, dir) =>
    table(s, dir, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("document_count"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy(col("source"))

  private val derivedCountsSql: String =
    """SELECT source, count(*) AS document_count,
      |  sum(n_chars)::BIGINT AS total_chars
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** W3: pagination = deterministic total order + offset/limit
    * (reference: schemas.py:77-83 slices a materialized list; the engine
    * fixes the unspecified-order wart with an explicit sort key).
    * offset+limit over a sort plans TakeOrderedAndProject of skip+limit
    * rows per partition — unlike a no-partition row_number window, which
    * would drag the whole table through a single task at scale. */
  private val pagination: QueryFn = (s, dir) =>
    table(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
      .offset(100)
      .limit(50)

  private val paginationSql: String =
    """SELECT doc_id, source, n_chars FROM documents
      |ORDER BY doc_id LIMIT 50 OFFSET 100""".stripMargin

  /** W4-style ranking window: top-3 orders per customer segment by price. */
  private val topPerGroup: QueryFn = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val ord = table(s, dir, "orders")
    val cust = table(s, dir, "customer")
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    ord.join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 3)
      .orderBy(col("c_mktsegment"), col("rnk"))
  }

  private val topPerGroupSql: String =
    """SELECT c_mktsegment, o_orderkey, o_totalprice,
      |  row_number() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |QUALIFY rnk <= 3 ORDER BY c_mktsegment, rnk""".stripMargin

  /** A3 + cardinalities: pagination totals and distinct counts.
    * countDistinct is exact (oracle-checkable); approx_count_distinct is
    * the 100TB-scale variant (see CoreSpec's approx-cardinality test). */
  private val cardinalities: QueryFn = (s, dir) =>
    table(s, dir, "lineitem")
      .agg(count(lit(1)).as("total"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"))

  private val cardinalitiesSql: String =
    """SELECT count(*) AS total, count(DISTINCT l_orderkey) AS n_orders,
      |  count(DISTINCT l_partkey) AS n_parts FROM lineitem""".stripMargin

  /** A3: the pagination envelope math — `total` over the full set,
    * `has_more = skip + limit < total` (reference: schemas.py:77-83; the
    * engine's Page does the same, EngineSpec covers it end-to-end). */
  private val paginationMeta: QueryFn = (s, dir) =>
    table(s, dir, "documents").agg(
      count(lit(1)).as("total"),
      (lit(150L) < count(lit(1))).as("has_more"))

  private val paginationMetaSql: String =
    "SELECT count(*) AS total, 150 < count(*) AS has_more FROM documents"

  /** Multi-level aggregation (ROLLUP): subtotals per returnflag and a
    * grand total in one pass — Spark expands the grouping sets and still
    * partial-aggregates map-side. Beyond the reference's surface (free in
    * Spark; SURVEY.md §2.4 notes the absence). */
  private val rollupAgg: QueryFn = (s, dir) =>
    table(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        (round(sum(col("l_quantity")), 2) + lit(0.0d)).as("sum_qty"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  private val rollupAggSql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  round(sum(l_quantity), 2) + 0 AS sum_qty
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** Exact interpolated percentiles (Spark `percentile` and DuckDB
    * `quantile_cont` both do linear interpolation over the sorted set). */
  private val percentiles: QueryFn = (s, dir) =>
    table(s, dir, "lineitem").agg(
      (round(expr("percentile(l_quantity, 0.25)"), 6) + lit(0.0d)).as("p25"),
      (round(expr("percentile(l_quantity, 0.5)"), 6) + lit(0.0d)).as("p50"),
      (round(expr("percentile(l_quantity, 0.75)"), 6) + lit(0.0d)).as("p75"))

  private val percentilesSql: String =
    """SELECT round(quantile_cont(l_quantity, 0.25), 6) + 0 AS p25,
      |  round(quantile_cont(l_quantity, 0.5), 6) + 0 AS p50,
      |  round(quantile_cont(l_quantity, 0.75), 6) + 0 AS p75
      |FROM lineitem""".stripMargin

  /** Backward as-of join: each purchase event enriched with the user's
    * most recent click at-or-before it (union + carry-forward window —
    * ONE |L|+|R| shuffle by user, no range-join pair blowup). The right
    * side is pre-deduped to one row per (user, ts) (max event_id), making
    * the match deterministic; the oracle is DuckDB's NATIVE ASOF LEFT
    * JOIN, so the operator's semantics are checked against an independent
    * first-class implementation, not a re-derivation. */
  private val asofEvents: QueryFn = (s, dir) => {
    import graft.operators.AsOfJoin
    val ev = eventsTable(s, dir)
    val clicks = ev.where(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts").as("click_ts"))
      .agg(max(col("event_id")).as("click_id"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    AsOfJoin.backward(purchases, clicks, "user_id", "ts", "click_ts",
        Seq("click_id", "click_ts"))
      .withColumn("asof_gap_us",
        unix_micros(col("ts")) - unix_micros(col("asof_click_ts")))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("asof_click_id"), col("asof_gap_us"))
      .orderBy(col("event_id"))
  }

  private val asofEventsSql: String =
    """WITH r AS (SELECT user_id, ts AS click_ts, max(event_id) AS click_id
      |           FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
      |l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
      |SELECT l.event_id, l.user_id, l.ts, r.click_id AS asof_click_id,
      |  epoch_us(l.ts) - epoch_us(r.click_ts) AS asof_gap_us
      |FROM l ASOF LEFT JOIN r
      |  ON l.user_id = r.user_id AND l.ts >= r.click_ts
      |ORDER BY l.event_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("agg_rollup", rollupAgg, Some(rollupAggSql)),
    Q("join_asof_events", asofEvents, Some(asofEventsSql)),
    Q("agg_percentiles", percentiles, Some(percentilesSql)),
    Q("agg_pagination_meta", paginationMeta, Some(paginationMetaSql)),
    Q("agg_lineitem_pushdown", aggLineitem, Some(aggLineitemSql)),
    Q("join_fk_chain_broadcast", fkChainJoin, Some(fkChainJoinSql)),
    Q("join_top_revenue", topRevenue, Some(topRevenueSql)),
    Q("join_semi_scope", semiJoin, Some(semiJoinSql)),
    Q("join_anti_cascade", antiJoinCascade, Some(antiJoinCascadeSql)),
    Q("agg_derived_counts", derivedCounts, Some(derivedCountsSql)),
    Q("window_pagination", pagination, Some(paginationSql)),
    Q("window_top_per_group", topPerGroup, Some(topPerGroupSql)),
    Q("agg_cardinalities", cardinalities, Some(cardinalitiesSql)),
  )
}
