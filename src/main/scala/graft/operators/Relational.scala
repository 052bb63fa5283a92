package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Catalog

/** The reference's remaining relational operator inventory (SURVEY.md §2):
  * anti-joins, scalar subqueries, pattern/membership/dynamic predicates,
  * pagination, string aggregation, set difference — plus the grouped
  * aggregates the downsampler implies (SURVEY.md §2.4 note).
  *
  * Scale notes: dimension sides of every join here are broadcast; grouped
  * aggregates run partial (map-side) automatically; top-k and pagination
  * plan as TakeOrderedAndProject — no global sort materializes the full
  * relation.
  */
object Relational {

  // ---------------------------------------------------------------------
  // J6 — anti-join (reference myapp/apps.py:55-69: users with no role
  // assignment). Customers with no finished order, declared left_anti —
  // the NOT-EXISTS form. (Deliberately NOT the NOT-IN form: one NULL key
  // on the subquery side makes SQL NOT IN return zero rows, a trap, while
  // left_anti/NOT EXISTS keep per-row semantics; the oracle mirrors
  // NOT EXISTS so both engines agree even on NULL-bearing data.)
  // ---------------------------------------------------------------------
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog.customer(spark, dir)
    val o = Catalog.orders(spark, dir)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  val customersWithoutOrdersSql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_orderstatus = 'F' AND o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // J7 — scalar subquery embedded in a predicate (reference
  // myapp/views.py:518-520: max_connections setting lookup). Orders priced
  // above the global average. Catalyst plans a ScalarSubquery (one-row
  // broadcast), not a cross join.
  // ---------------------------------------------------------------------
  def ordersAboveAverage(spark: SparkSession, dir: String): DataFrame = {
    // the scalar subquery as a 1-row broadcast cross join — no temp view
    // (a fixed-name view would make concurrent callers race on session
    // state), same ScalarSubquery plan shape after Catalyst
    val o = Catalog.orders(spark, dir)
    val price = col("o_totalprice").cast("decimal(18,2)")
    val avgPrice = broadcast(
      o.agg(avg(price).cast("decimal(18,2)").as("avg_price")))
    o.crossJoin(avgPrice)
      .filter(price > col("avg_price"))
      // comparison stays exact-decimal; output edge is DOUBLE for
      // cross-engine canonicalization (same pattern as g1_pricing_summary)
      .select(col("o_orderkey"), col("o_custkey"),
        price.cast("double").as("total_price"))
      .orderBy(col("o_orderkey"))
  }

  val ordersAboveAverageSql: String =
    """SELECT o_orderkey, o_custkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price
      |FROM orders
      |WHERE CAST(o_totalprice AS DECIMAL(18,2)) >
      | (SELECT CAST(avg(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) FROM orders)
      |ORDER BY o_orderkey""".stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // P8 — LIKE pattern predicate (reference myapp/views.py:474:
  // schema_name NOT LIKE 'pg_%').
  // ---------------------------------------------------------------------
  def partsNotLikePromo(spark: SparkSession, dir: String): DataFrame =
    Catalog.part(spark, dir)
      .filter(!col("p_type").like("PROMO%") && col("p_brand").like("Brand#1%"))
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"))
      .orderBy(col("p_partkey"))

  val partsNotLikePromoSql: String =
    """SELECT p_partkey, p_name, p_brand, p_type FROM part
      |WHERE p_type NOT LIKE 'PROMO%' AND p_brand LIKE 'Brand#1%'
      |ORDER BY p_partkey""".stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // P10/T6 — dynamic predicate assembly + pagination (reference
  // myapp/views.py:839-862 cpu grid filters; cpu_usage_grid.html:174-199
  // 10-row pages). Filters fold onto the base scan so every predicate
  // pushes down to the parquet reader; page 3 of the filtered grid.
  // ---------------------------------------------------------------------
  def gridQuery(filters: Seq[Column], page: Int, pageSize: Int)(
      spark: SparkSession, dir: String): DataFrame = {
    val base = Catalog.events(spark, dir)
    filters.foldLeft(base)((d, p) => d.filter(p))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))
      .offset(page * pageSize)
      .limit(pageSize)
  }

  def gridPage(spark: SparkSession, dir: String): DataFrame =
    gridQuery(
      Seq(col("event_type") === "click", col("value") > 50.0),
      page = 3, pageSize = 10)(spark, dir)

  val gridPageSql: String =
    """SELECT event_id, user_id, event_type, value FROM events
      |WHERE event_type = 'click' AND value > 50.0
      |ORDER BY event_id LIMIT 10 OFFSET 30""".stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // P11 — membership predicate (reference myapp/views.py:89-92 role IN (…)).
  // ---------------------------------------------------------------------
  def eventsOfKinds(spark: SparkSession, dir: String): DataFrame =
    Catalog.events(spark, dir)
      .filter(col("event_type").isin("signup", "error"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("users"))
      .orderBy(col("event_type"))

  val eventsOfKindsSql: String =
    """SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS users
      |FROM events WHERE event_type IN ('signup','error')
      |GROUP BY event_type ORDER BY event_type""".stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // P12 — case-insensitive substring search across all columns (reference
  // cpu_usage_grid.html:201-214 JS rowText.includes(filter)), distributed
  // instead of in the browser.
  // ---------------------------------------------------------------------
  def searchAllColumns(needle: String)(spark: SparkSession, dir: String): DataFrame = {
    val df = Catalog.part(spark, dir)
    val rowText = lower(concat_ws("\u0001", df.columns.map(col): _*))
    df.filter(rowText.contains(needle.toLowerCase))
      .orderBy(col("p_partkey"))
  }

  def searchParts(spark: SparkSession, dir: String): DataFrame =
    searchAllColumns("red widget")(spark, dir)

  val searchPartsSql: String =
    """SELECT * FROM part
      |WHERE contains(lower(concat_ws(chr(1), p_partkey, p_name, p_brand, p_type, p_size, p_retailprice)), 'red widget')
      |ORDER BY p_partkey""".stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // A6 — string aggregation with deterministic order (reference
  // myapp/views.py:966-971 STRING_AGG(column_name, ', ')); sorted
  // collect_list for cross-engine determinism (SURVEY.md §2.4 A6 caveat).
  // ---------------------------------------------------------------------
  def nationsPerRegion(spark: SparkSession, dir: String): DataFrame = {
    val n = Catalog.nation(spark, dir)
    val r = broadcast(Catalog.region(spark, dir))
    n.join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name").as("region"))
      .agg(concat_ws(", ", array_sort(collect_list(col("n_name")))).as("nations"))
      .orderBy(col("region"))
  }

  val nationsPerRegionSql: String =
    """SELECT r_name AS region, string_agg(n_name, ', ' ORDER BY n_name) AS nations
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY region""".stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // E2 — set difference (reference myapp/apps.py:55-69 semantics):
  // (user, day) pairs with a view but no purchase, as a true EXCEPT.
  // ---------------------------------------------------------------------
  def viewersNotBuyers(spark: SparkSession, dir: String): DataFrame = {
    val ev = Catalog.events(spark, dir)
    def byDay(kind: String) = ev.filter(col("event_type") === kind)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    byDay("view").except(byDay("purchase"))
      .orderBy(col("user_id"), col("day"))
  }

  val viewersNotBuyersSql: String =
    """SELECT user_id, day FROM (
      | SELECT user_id, CAST(ts AS DATE) AS day FROM events WHERE event_type = 'view'
      | EXCEPT
      | SELECT user_id, CAST(ts AS DATE) AS day FROM events WHERE event_type = 'purchase') t
      |ORDER BY user_id, day""".stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // E3 — set intersection, completing the set-op family (E1 DISTINCT,
  // E2 EXCEPT): (user, day) pairs that both viewed AND purchased. Spark
  // plans INTERSECT as a distinct + left-semi hash join on the pair —
  // the same one-shuffle shape as E2's anti form.
  // ---------------------------------------------------------------------
  def viewersAndBuyers(spark: SparkSession, dir: String): DataFrame = {
    val ev = Catalog.events(spark, dir)
    def byDay(kind: String) = ev.filter(col("event_type") === kind)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    byDay("view").intersect(byDay("purchase"))
      .orderBy(col("user_id"), col("day"))
  }

  val viewersAndBuyersSql: String =
    """SELECT user_id, day FROM (
      | SELECT user_id, CAST(ts AS DATE) AS day FROM events WHERE event_type = 'view'
      | INTERSECT
      | SELECT user_id, CAST(ts AS DATE) AS day FROM events WHERE event_type = 'purchase') t
      |ORDER BY user_id, day""".stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // E4 — relational DIVISION, the classic operator the set family is
  // incomplete without: "users who did EVERY event type" (÷ in Codd's
  // algebra — the FOR ALL the other ops can't express without double
  // negation). Implemented as the count-matching form: distinct
  // (user, type) pairs, per-user distinct count equal to the corpus-wide
  // distinct type count. NULL users/types are excluded — NULL is not a
  // divisor value, and a NULL user is not an entity.
  //
  // Plan/scale: one distinct-pair aggregate (map-side partial), one
  // per-user count off the SAME partitioning, and the 1-row divisor
  // count broadcast (j7's allowed scalar shape). The double-negated
  // NOT EXISTS form plans two anti-joins — strictly worse.
  // ---------------------------------------------------------------------
  def relationalDivision(spark: SparkSession, dir: String): DataFrame =
    relationalDivisionOf(Catalog.events(spark, dir))

  /** e4 core over any events-shaped frame (spec entry point). */
  def relationalDivisionOf(events: DataFrame): DataFrame = {
    val ev = events
      .filter(col("user_id").isNotNull && col("event_type").isNotNull)
    val pairs = ev.select(col("user_id"), col("event_type")).distinct()
    val divisor = pairs.select(col("event_type")).distinct()
      .agg(count(lit(1)).as("n_types"))
    pairs.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_user_types"))
      .crossJoin(broadcast(divisor))
      .filter(col("n_user_types") === col("n_types"))
      .select(col("user_id"), col("n_user_types").as("n_types"))
      .orderBy(col("user_id"))
  }

  val relationalDivisionSql: String =
    """WITH p AS (
      | SELECT DISTINCT user_id, event_type FROM events
      | WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
      |d AS (SELECT count(DISTINCT event_type) AS n_types FROM p)
      |SELECT user_id, count(*)::BIGINT AS n_types
      |FROM p GROUP BY user_id
      |HAVING count(*) = (SELECT n_types FROM d)
      |ORDER BY user_id""".stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // G1 — grouped multi-aggregate (the TPC-H Q1 shape; SURVEY.md §2.4 notes
  // the reference's aggs are all global — grouped variants are our scale
  // path: partial map-side agg, 4 output rows from 600k inputs). Exact
  // decimal sums so both engines agree bit-for-bit.
  // ---------------------------------------------------------------------
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val l = Catalog.lineitem(spark, dir)
    val qty = col("l_quantity").cast("decimal(18,2)")
    val price = col("l_extendedprice").cast("decimal(18,2)")
    val disc = col("l_discount").cast("decimal(18,2)")
    val tax = col("l_tax").cast("decimal(18,2)")
    l.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(qty).as("sum_qty_dec"),
        sum(price).as("sum_base_price_dec"),
        sum((price * (lit(1).cast("decimal(18,2)") - disc)).cast("decimal(28,4)")).as("sum_disc_price_dec"),
        sum((price * (lit(1).cast("decimal(18,2)") - disc) * (lit(1).cast("decimal(18,2)") + tax)).cast("decimal(28,6)")).as("sum_charge_dec"),
        count(lit(1)).as("count_order"))
      // sums stay exact-decimal internally; the output edge is DOUBLE so
      // both engines canonicalize identically (gate hashes string forms)
      .select(col("l_returnflag"), col("l_linestatus"),
        col("sum_qty_dec").cast("double").as("sum_qty"),
        col("sum_base_price_dec").cast("double").as("sum_base_price"),
        col("sum_disc_price_dec").cast("double").as("sum_disc_price"),
        col("sum_charge_dec").cast("double").as("sum_charge"),
        col("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      | CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
      | CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2))) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
      | count(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // G2 — join + grouped agg + top-k (the TPC-H Q3 shape): revenue per
  // order for a market segment. Exercises broadcast dim filter → shuffle
  // agg → TakeOrderedAndProject, the canonical 100 TB plan shape.
  // ---------------------------------------------------------------------
  def segmentRevenue(spark: SparkSession, dir: String): DataFrame = {
    val c = broadcast(
      Catalog.customer(spark, dir)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey")))
    val o = Catalog.orders(spark, dir)
    val l = Catalog.lineitem(spark, dir)
    val price = col("l_extendedprice").cast("decimal(18,2)")
    val disc = col("l_discount").cast("decimal(18,2)")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(o("o_orderkey"), o("o_orderdate"))
      .agg(sum((price * (lit(1).cast("decimal(18,2)") - disc)).cast("decimal(28,4)")).as("revenue_dec"))
      // sum stays exact-decimal; output edge is DOUBLE so both engines
      // canonicalize identically (same pattern as g1_pricing_summary)
      .select(
        col("o_orderkey").as("order_key"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("revenue_dec").cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("order_key"))
      .limit(10)
  }

  val segmentRevenueSql: String =
    """SELECT o_orderkey AS order_key, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
      | CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
      |FROM orders
      | JOIN customer ON o_custkey = c_custkey
      | JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY o_orderkey, o_orderdate
      |ORDER BY revenue DESC, order_key LIMIT 10""".stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // J5 — semi-join (reference myapp/views.py:161-164: correlated name
  // lookup feeding INSERT…SELECT): customers with at least one urgent
  // order — left_semi keeps the probe side only, no duplication, and the
  // filtered build side broadcasts.
  // ---------------------------------------------------------------------
  def customersWithUrgentOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog.customer(spark, dir)
    val o = Catalog.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    c.join(broadcast(o), c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  val customersWithUrgentOrdersSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // S3/S4 — parameterized point lookup (reference myapp/views.py:80-81:
  // SELECT id FROM auth_user WHERE id = %s). The predicate reaches the
  // parquet scan as an EqualTo pushed filter — row-group pruning at scale.
  // ---------------------------------------------------------------------
  def pointLookup(key: Long)(spark: SparkSession, dir: String): DataFrame =
    Catalog.customer(spark, dir)
      .filter(col("c_custkey") === lit(key))
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))

  def pointLookup42(spark: SparkSession, dir: String): DataFrame =
    pointLookup(42L)(spark, dir)

  val pointLookup42Sql: String =
    "SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey = 42"

  // ---------------------------------------------------------------------
  // R1 — ranking-family window (SURVEY §2.5: "the ranking family comes
  // free with Window once W3 exists"): top-3 customers by account balance
  // within each nation via dense_rank.
  // ---------------------------------------------------------------------
  def topCustomersPerNation(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Catalog.customer(spark, dir)
      .withColumn("rnk", dense_rank().over(w))
      .filter(col("rnk") <= 3)
      // DECIMAL(18,2) canonicalizes the cents exactly, then the output
      // edge is DOUBLE so both engines hash identically (g1 pattern)
      .select(col("c_nationkey").cast("int").as("nation_key"),
        col("rnk"), col("c_custkey"), col("c_name"),
        col("c_acctbal").cast("decimal(18,2)").cast("double").as("acctbal"))
      .orderBy(col("nation_key"), col("rnk"), col("c_custkey"))
  }

  val topCustomersPerNationSql: String =
    """SELECT CAST(c_nationkey AS INT) AS nation_key, rnk, c_custkey, c_name,
      | CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
      |FROM (
      | SELECT c_nationkey, c_custkey, c_name, c_acctbal,
      |  dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rnk
      | FROM customer) t
      |WHERE rnk <= 3
      |ORDER BY nation_key, rnk, c_custkey""".stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // R2 — the distribution-rank window trio (percent_rank / cume_dist /
  // ntile): where r1 answers "who are the top k", these answer "where
  // does EVERY row sit" — the percentile-position features an analyst
  // (or a z9-style curriculum builder) derives per group. One window
  // spec serves all three functions (one shuffle + one per-partition
  // sort). The window orders by (acctbal, custkey) — the explicit
  // tiebreak makes ntile's row-position assignment deterministic
  // cross-engine (on a tie ntile splits equal values across tiles by
  // ROW order, which is engine-arbitrary without a total order; r1's
  // dense_rank lesson applied to position functions). percent_rank and
  // cume_dist are single IEEE divisions of exact integers — identical
  // in both engines, rounded at the edge as belt and braces.
  // ---------------------------------------------------------------------
  def distributionRanks(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Catalog.customer(spark, dir)
      .filter(col("c_nationkey").isin(1, 2))
      .select(col("c_nationkey").cast("int").as("nation_key"),
        col("c_custkey"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        ntile(4).over(w).cast("long").as("quartile"))
      .orderBy(col("nation_key"), col("c_custkey"))
  }

  val distributionRanksSql: String =
    """SELECT CAST(c_nationkey AS INT) AS nation_key, c_custkey,
      | round(percent_rank() OVER w, 6) AS pct_rank,
      | round(cume_dist() OVER w, 6) AS cume,
      | CAST(ntile(4) OVER w AS BIGINT) AS quartile
      |FROM customer WHERE c_nationkey IN (1, 2)
      |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
      |ORDER BY nation_key, c_custkey""".stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // H1 — grouped aggregate with a group filter (HAVING): nations whose
  // customers hold > threshold total balance. The HAVING predicate runs
  // post-aggregation — 25 groups, not 15k rows.
  // ---------------------------------------------------------------------
  def richNations(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog.customer(spark, dir)
    val n = broadcast(Catalog.nation(spark, dir))
    val totals = c.join(n, c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(sum(col("c_acctbal").cast("decimal(18,2)")).as("total_balance"),
        count(lit(1)).as("n_customers"))
    // scale-relative HAVING: groups above the average group total — the
    // window avg runs over 25 aggregated rows, not the customer table
    totals
      .withColumn("avg_total",
        avg(col("total_balance")).over(Window.partitionBy()))
      .filter(col("total_balance") > col("avg_total"))
      // HAVING compares exact decimals; the output edge is DOUBLE for
      // cross-engine canonicalization (same pattern as g1_pricing_summary)
      .select(col("nation"),
        col("total_balance").cast("double").as("total_balance"),
        col("n_customers"))
      .orderBy(col("nation"))
  }

  val richNationsSql: String =
    """SELECT nation, CAST(total_balance AS DOUBLE) AS total_balance, n_customers FROM (
      | SELECT n_name AS nation, sum(CAST(c_acctbal AS DECIMAL(18,2))) AS total_balance,
      |  count(*) AS n_customers
      | FROM customer JOIN nation ON c_nationkey = n_nationkey
      | GROUP BY n_name) t
      |WHERE total_balance > (
      | SELECT avg(total_balance) FROM (
      |  SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS total_balance
      |  FROM customer JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY n_name) s)
      |ORDER BY nation""".stripMargin.replace('\n', ' ')

  /** Registry of this module's catalogued queries. */
  // ---------------------------------------------------------------------
  // J9 — range (interval) join: count the events falling inside each of a
  // set of time windows — the incident-correlation primitive (j4's minute
  // buckets and w5's as-of are its equality and latest-only special
  // cases; the general form joins points to arbitrary intervals). Spark
  // plans a raw `ON p.ts BETWEEN w.lo AND w.hi` as BroadcastNestedLoop —
  // O(|wins|·|points|) and a scale-killer once the interval side outgrows
  // a broadcast. The scalable form BUCKETS both sides on a fixed time
  // grid: each interval explodes to the grid cells it overlaps
  // (bounded by interval_len/bucket + 1 ≈ 3 cells here), points map to
  // exactly one cell, and the join becomes an equi-join on the cell key
  // followed by the exact containment filter inside the join — a hash
  // shuffle both arms, never a loop join. A (window, point) pair shares
  // exactly one cell (the point's), so no post-join dedup is needed.
  // The count aggregate is keyed by window id; windows with no points
  // survive via a left join back to the interval relation.
  // ---------------------------------------------------------------------
  /** Bucket width. Chosen ≥ the typical interval length so explosion
    * stays ~2-3 cells per interval; a deployment tunes it to its interval
    * distribution (width ≪ intervals wastes fan-out, width ≫ intervals
    * wastes filter selectivity).
    */
  val RangeBucketSec = 300L
  /** Half-open window length for the registered query. */
  val RangeWindowMin = 10

  /** Bucketed range-join core over any (win_id, win_start, win_end) ×
    * (view_id, view_ts) pair of frames (specs inject hand-built ones):
    * per-window counts of points with win_start ≤ ts < win_end, zero-point
    * windows included.
    */
  def rangeJoinCounts(wins: DataFrame, points: DataFrame,
      cellSeconds: Long = RangeBucketSec): DataFrame = {
    def cell(ts: Column): Column =
      floor(ts.cast("long") / lit(cellSeconds)).cast("long")
    // end is exclusive, so a window ending exactly on a grid line gains
    // only an empty trailing cell — harmless superset, exactness restored
    // by the containment filter
    val winCells = wins.withColumn("cell",
      explode(sequence(cell(col("win_start")), cell(col("win_end")))))
    val pointCells = points.withColumn("cell", cell(col("view_ts")))
    val matched = winCells.join(pointCells, Seq("cell"))
      .filter(col("view_ts") >= col("win_start") &&
        col("view_ts") < col("win_end"))
      .groupBy(col("win_id")).agg(count(lit(1)).as("n_views"))
    wins.join(matched, Seq("win_id"), "left")
      .select(col("win_id"), col("win_start"), col("win_end"),
        coalesce(col("n_views"), lit(0L)).as("n_views"))
  }

  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Catalog.events(spark, dir)
    val wins = ev
      .filter(col("event_type") === "error" && col("value") > 100)
      .select(col("event_id").as("win_id"), col("ts").as("win_start"),
        (col("ts") + expr(s"INTERVAL $RangeWindowMin MINUTES")).as("win_end"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("ts").as("view_ts"))
    rangeJoinCounts(wins, views).orderBy(col("win_id"))
  }

  /** J12 — j9's interval join written the way a USER writes it: a raw
    * non-equi inner join `ON ts >= win_start AND ts < win_end`, no manual
    * grid. Correctness comes from Spark; the PLAN comes from
    * [[graft.plans.RangeJoinRewrite]] — the injected optimizer rule must
    * turn this into the grid equi-join, and the builder asserts it did
    * (no BroadcastNestedLoopJoin, grid cell key present) so a session
    * missing the extension fails loudly instead of silently planning the
    * O(|wins|·|points|) loop join. Oracle = j9's SQL: the rewrite is
    * exact, so the naive form must hash-match the hand-built grid.
    */
  def rangeJoinNaive(spark: SparkSession, dir: String): DataFrame = {
    val ev = Catalog.events(spark, dir)
    val wins = ev
      .filter(col("event_type") === "error" && col("value") > 100)
      .select(col("event_id").as("win_id"), col("ts").as("win_start"),
        (col("ts") + expr(s"INTERVAL $RangeWindowMin MINUTES")).as("win_end"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("ts").as("view_ts"))
    val matched = views.join(wins,
        views("view_ts") >= wins("win_start") &&
          views("view_ts") < wins("win_end"))
      .groupBy(col("win_id")).agg(count(lit(1)).as("n_views"))
    val out = wins.join(matched, Seq("win_id"), "left")
      .select(col("win_id"), col("win_start"), col("win_end"),
        coalesce(col("n_views"), lit(0L)).as("n_views"))
      .orderBy(col("win_id"))
    val exec = out.queryExecution.executedPlan
    val loops = exec.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    require(loops.isEmpty && exec.toString.contains("graft_range_cell"),
      "RangeJoinRewrite did not fire: the naive interval join planned a " +
        s"loop join (is graft.GraftExtensions registered?):\n$exec")
    out
  }

  val rangeJoinSql: String =
    s"""WITH wins AS (
       | SELECT event_id AS win_id, ts AS win_start,
       |  ts + INTERVAL $RangeWindowMin MINUTE AS win_end
       | FROM events WHERE event_type = 'error' AND value > 100),
       |v AS (SELECT ts FROM events WHERE event_type = 'view')
       |SELECT w.win_id, w.win_start, w.win_end, count(v.ts) AS n_views
       |FROM wins w LEFT JOIN v ON v.ts >= w.win_start AND v.ts < w.win_end
       |GROUP BY w.win_id, w.win_start, w.win_end
       |ORDER BY w.win_id""".stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // J11 — interval OVERLAP join: which sessions overlapped which error
  // incidents — the remaining classic join shape after equi (j1-j6),
  // as-of (w5), band/range (j9), and salted (j10): BOTH sides are
  // intervals and the predicate is overlap (a.start ≤ b.end ∧
  // b.start ≤ a.end), the incident-impact question every ops review
  // asks ("whose sessions were hit?"). Naively a non-equi nested loop;
  // the j9 grid discipline generalizes to two interval sides — each
  // side explodes over the fixed-width cells it spans, the join is a
  // plain cell EQUI-join with the exact overlap predicate as residual,
  // and double-counting (a pair shares many cells) is eliminated by an
  // OWNERSHIP rule: keep only the cell containing the overlap's START
  // (greatest of the two starts — it lies inside both intervals, so
  // exactly one kept row per overlapping pair, no distinct needed).
  //
  // Gate sides: user sessions (w4's gap rule via the shared
  // sessionCore — the rule cannot fork) × error INCIDENTS
  // (gaps-and-islands over the DISTINCT error minutes; the single-
  // partition island window is safe at any corpus scale because the
  // distinct-minute relation is HORIZON-sized — a year is 526k rows —
  // not corpus-sized). Incidents close at last-error-minute + 1 min;
  // intervals compare CLOSED, so a session touching an incident
  // boundary reports a 0 µs overlap — present, measured as zero.
  // At gate scale the incident side is broadcast-sized and Catalyst
  // picks the broadcast plan from stats; intervalJoinOf is the general
  // both-sides-large grid form.
  // ---------------------------------------------------------------------
  val IntervalCellSec = 3600L

  /** Overlap join of (user_id, s_start, s_end) × (i_start, i_end),
    * closed intervals: one row per overlapping pair with the exact
    * overlap duration in microseconds.
    */
  def intervalJoinOf(sessions: DataFrame, incidents: DataFrame): DataFrame = {
    def cell(ts: Column): Column =
      floor(ts.cast("long") / lit(IntervalCellSec)).cast("long")
    val sCells = sessions.withColumn("cell",
      explode(sequence(cell(col("s_start")), cell(col("s_end")))))
    val iCells = incidents.withColumn("cell",
      explode(sequence(cell(col("i_start")), cell(col("i_end")))))
    sCells.join(iCells, Seq("cell"))
      .filter(col("s_start") <= col("i_end") &&
        col("i_start") <= col("s_end"))
      .filter(col("cell") === cell(greatest(col("s_start"), col("i_start"))))
      .select(col("user_id"),
        col("s_start").as("session_start"),
        col("i_start").as("incident_start"),
        (unix_micros(least(col("s_end"), col("i_end"))) -
          unix_micros(greatest(col("s_start"), col("i_start"))))
          .as("overlap_us"))
  }

  def intervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val sessions = Monitoring.sessionCore(spark, dir)
      .select(col("user_id"), col("session_start").as("s_start"),
        col("session_end").as("s_end"))
    val mins = Catalog.events(spark, dir)
      .filter(col("event_type") === "error")
      .select(date_trunc("minute", col("ts")).as("m")).distinct()
    val wOrd = org.apache.spark.sql.expressions.Window.orderBy(col("m"))
    val incidents = mins
      .withColumn("k",
        (unix_seconds(col("m")) / 60L) - row_number().over(wOrd))
      .groupBy(col("k"))
      .agg(min(col("m")).as("i_start"),
        (max(col("m")) + expr("INTERVAL 1 MINUTE")).as("i_end"))
      .select(col("i_start"), col("i_end"))
    intervalJoinOf(sessions, incidents)
      .orderBy(col("user_id"), col("session_start"), col("incident_start"))
  }

  val intervalJoinSql: String =
    s"""WITH flagged AS (
       | SELECT user_id, ts, event_id,
       |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
       |       OR ts > lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
       |            + INTERVAL ${graft.operators.Monitoring.SessionGapMinutes} MINUTE
       |   THEN 1 ELSE 0 END AS new_sess
       | FROM events),
       |sess AS (
       | SELECT user_id, min(ts) AS s_start, max(ts) AS s_end
       | FROM (SELECT user_id, ts,
       |   sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |     ROWS UNBOUNDED PRECEDING) AS session_seq FROM flagged)
       | GROUP BY user_id, session_seq),
       |em AS (SELECT DISTINCT date_trunc('minute', ts) AS m
       | FROM events WHERE event_type = 'error'),
       |isl AS (SELECT m,
       |  epoch(m) // 60 - row_number() OVER (ORDER BY m) AS k FROM em),
       |inc AS (SELECT min(m) AS i_start, max(m) + INTERVAL 1 MINUTE AS i_end
       | FROM isl GROUP BY k)
       |SELECT s.user_id, s.s_start AS session_start,
       | i.i_start AS incident_start,
       | epoch_us(least(s.s_end, i.i_end))
       |  - epoch_us(greatest(s.s_start, i.i_start)) AS overlap_us
       |FROM sess s JOIN inc i
       | ON s.s_start <= i.i_end AND i.i_start <= s.s_end
       |ORDER BY user_id, session_start, incident_start"""
      .stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // G3 — ROLLUP grouping sets: the multi-granularity rollup a dashboard
  // renders as group + subtotal + grand-total rows (the reference
  // recomputes each granularity with separate queries; ROLLUP computes
  // all levels in ONE pass — Spark expands grouping sets inside the
  // aggregate, so partial aggregation and the single shuffle are
  // preserved). Subtotal rows carry NULL group keys in both engines;
  // sums stay exact-decimal internally, DOUBLE at the output edge (g1's
  // canonicalization pattern).
  // ---------------------------------------------------------------------
  def rollupSummary(spark: SparkSession, dir: String): DataFrame = {
    val l = Catalog.lineitem(spark, dir)
    val qty = col("l_quantity").cast("decimal(18,2)")
    // finest-group pre-aggregate first, ROLLUP the tiny result (g4's
    // argument: the grouping-set Expand multiplies its input ×levels, so
    // point it at the group-cardinality-bounded relation, not the
    // corpus; sound because sum/count decompose)
    l.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(qty).as("sq"), count(lit(1)).as("n"))
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("sq")).as("sum_qty_dec"), sum(col("n")).as("n_items"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("sum_qty_dec").cast("double").as("sum_qty"), col("n_items"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
  }

  val rollupSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      | count(*) AS n_items
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""
      .stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // G4 — CUBE: g3's rollup gives the (a,b) → (a) → () prefix ladder; cube
  // adds the (b)-only slice, i.e. every subset of the grouping set — the
  // full OLAP cross-tab a BI layer asks for in one statement.
  // `grouping_id()` disambiguates a NULL that MEANS "subtotal" from a
  // NULL in the data — the standard cube-reading discipline (both
  // engines emit the same bit vector, left column = MSB). Plan: ONE
  // Expand (×4 grouping sets) into one hash aggregate — same cost class
  // as c1's multi-distinct; partials combine map-side, so the shuffle
  // carries ≤ 4×|distinct groups| rows, not the corpus.
  // ---------------------------------------------------------------------
  def cubeSummary(spark: SparkSession, dir: String): DataFrame = {
    val l = Catalog.lineitem(spark, dir)
    val qty = col("l_quantity").cast("decimal(18,2)")
    // pre-aggregate to the FINEST grouping first, then cube the tiny
    // pre-aggregate re-aggregating decomposable partials (sum of sums,
    // sum of counts): CUBE's Expand multiplies its INPUT by 2^d, so run
    // it over |distinct (flag, status)| rows (≤ ~10), not the corpus —
    // the fact table pays one ordinary single-shuffle aggregate and the
    // 2^d blowup applies to a relation whose size is bounded by group
    // cardinality at ANY corpus scale. (Correct only because sum/count
    // decompose; a non-decomposable aggregate — exact percentile,
    // countDistinct — must cube the base table.) Measured 1.67→~0.9 s
    // at sf0.1; at 100 TB it is the difference between 4× the corpus
    // through Expand and 4× a 10-row relation.
    l.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(qty).as("sq"), count(lit(1)).as("n"))
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("sq")).as("sum_qty_dec"), sum(col("n")).as("n_items"),
        grouping_id().cast("long").as("gid"))
      .select(col("l_returnflag"), col("l_linestatus"), col("gid"),
        col("sum_qty_dec").cast("double").as("sum_qty"), col("n_items"))
      .orderBy(col("gid"),
        col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
  }

  val cubeSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      | count(*) AS n_items
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""
      .stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // G5 — explicit GROUPING SETS: exactly the slices actually served, no
  // more. g3's ROLLUP is the prefix ladder, g4's CUBE is every subset
  // (2^d Expand rows per input row) — but a dashboard that renders the
  // per-flag table and the per-status table needs exactly TWO 1-D
  // slices, and explicit sets deliver them in ONE scan + ONE Expand(×2)
  // + one hash aggregate where naive code runs two scans and CUBE pays
  // ×4 Expand and discards half its output. This is SCALE.md's g4
  // advice ("cube wide tables through explicit GROUPING SETS of the
  // combinations actually served") as a first-class operator.
  // grouping_id disambiguates which slice a row belongs to (same bit
  // vector both engines, left column = MSB — the g4 contract).
  // ---------------------------------------------------------------------
  def groupingSetsSummary(spark: SparkSession, dir: String): DataFrame = {
    val l = Catalog.lineitem(spark, dir)
    val qty = col("l_quantity").cast("decimal(18,2)")
    // finest-group pre-aggregate, then the explicit sets over it (g4's
    // argument; here it also makes the ×2 Expand input 10 rows)
    l.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(qty).as("sq"), count(lit(1)).as("n"))
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("sq")).as("sum_qty_dec"), sum(col("n")).as("n_items"),
        grouping_id().cast("long").as("gid"))
      .select(col("l_returnflag"), col("l_linestatus"), col("gid"),
        col("sum_qty_dec").cast("double").as("sum_qty"), col("n_items"))
      .orderBy(col("gid"),
        col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
  }

  val groupingSetsSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      | count(*) AS n_items
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
      |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""
      .stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // G6 — the deep snowflake join (the TPC-H Q5 shape): revenue per nation
  // where the customer and the line's SUPPLIER sit in the same nation,
  // region-scoped and date-bounded. This is the one relational shape
  // g1–g5 don't cover: a 6-table join where the ONE genuinely
  // dimension-sized relation (region→nation, a 5-row key set after the
  // region filter) broadcasts by explicit hint, and the two fact-fact
  // legs (orders⋈lineitem) shuffle on their natural key.
  //
  // Broadcast discipline (ADVICE r11): customer (150k rows/SF) and
  // supplier (10k rows/SF) both grow LINEARLY with scale factor, so
  // force-broadcasting them would bypass autoBroadcastJoinThreshold and
  // OOM executors at the 100 TB end. Only nation gets the hint —
  // bounded at 25 rows by the data model regardless of SF. Customer and
  // supplier joins are left to the optimizer's size estimate: at test
  // SFs they broadcast (both sit far under the 10 MB threshold, so the
  // local plan is the same as before), and at cluster scale they
  // degrade gracefully to shuffle joins on their keys instead of
  // dying. That is the correct trade: a shuffle on c_custkey co-located
  // with the orders join key is the plan a 1000-executor deployment
  // wants anyway.
  //
  // The same-nation equality lands as a join condition, not a
  // post-filter, so rows from other nations never survive the probe.
  // Exact-decimal revenue (the g1 discipline), DOUBLE only at the
  // output edge.
  // ---------------------------------------------------------------------
  val G6Region = "ASIA"
  val G6YearStart = "1996-01-01"
  val G6YearEnd = "1997-01-01"

  def localSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val price = col("l_extendedprice").cast("decimal(18,2)")
    val disc = col("l_discount").cast("decimal(18,2)")
    // region → nation: the 5-row key set every other dimension carries
    val n = Catalog.nation(spark, dir)
      .join(Catalog.region(spark, dir).filter(col("r_name") === G6Region),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    // no broadcast() hint on cust/supp: both scale linearly with SF
    // (see header) — only the bounded 25-row nation relation is hinted
    val cust = Catalog.customer(spark, dir)
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"))
    val supp = Catalog.supplier(spark, dir)
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    val o = Catalog.orders(spark, dir)
      .filter(col("o_orderdate") >= lit(G6YearStart).cast("timestamp") &&
        col("o_orderdate") < lit(G6YearEnd).cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val l = Catalog.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        (price * (lit(1).cast("decimal(18,2)") - disc))
          .cast("decimal(28,4)").as("rev"))
    o.join(cust, col("o_custkey") === col("c_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("rev")).as("revenue_dec"),
        count(lit(1)).as("n_lineitems"))
      // exact-decimal internally; DOUBLE at the edge so both engines
      // canonicalize identically (the g1 pattern)
      .select(col("n_name").as("nation"),
        col("revenue_dec").cast("double").as("revenue"),
        col("n_lineitems"))
      .orderBy(col("revenue").desc, col("nation"))
  }

  val localSupplierVolumeSql: String =
    s"""SELECT n_name AS nation,
       | CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
       | count(*) AS n_lineitems
       |FROM customer
       | JOIN orders ON c_custkey = o_custkey
       | JOIN lineitem ON l_orderkey = o_orderkey
       | JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       | JOIN nation ON s_nationkey = n_nationkey
       | JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = '$G6Region'
       | AND o_orderdate >= TIMESTAMP '$G6YearStart 00:00:00'
       | AND o_orderdate < TIMESTAMP '$G6YearEnd 00:00:00'
       |GROUP BY n_name
       |ORDER BY revenue DESC, nation""".stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // A8 — pivot: per-day event counts spread across one column per event
  // type (the wide shape every dashboard table renders). The pivot value
  // list is EXPLICIT, so Spark skips the extra distinct-values collect
  // job and the plan is one grouped conditional aggregate — identical
  // shape to the oracle's FILTER counts; absent combinations are 0, not
  // NULL, on both engines.
  // ---------------------------------------------------------------------
  private val PivotTypes = Seq("click", "error", "purchase", "signup", "view")

  def eventPivot(spark: SparkSession, dir: String): DataFrame = {
    val p = Catalog.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .pivot("event_type", PivotTypes)
      .count()
    p.select(col("day") +:
        PivotTypes.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      .orderBy(col("day"))
  }

  val eventPivotSql: String = {
    val cols = PivotTypes.map(t =>
      s"count(*) FILTER (WHERE event_type = '$t') AS $t").mkString(", ")
    s"""SELECT CAST(ts AS DATE) AS day, $cols
       |FROM events GROUP BY 1 ORDER BY day""".stripMargin.replace('\n', ' ')
  }

  // ---------------------------------------------------------------------
  // P13 — exact interpolated percentiles per group (the latency-quantile
  // rollup every monitoring dashboard needs; the reference renders only
  // min/max/avg gauges — percentiles are the standard upgrade). EXACT
  // percentile (not approx_percentile): both engines compute the same
  // h = (n−1)·q linear interpolation in plain IEEE arithmetic — no
  // transcendental, so the hash matches bit-for-bit with NO rounding
  // (verified at sf0.01 and sf0.1). Exact percentile sorts within each
  // group — per-group cardinality bounds the cost, the right trade for
  // grouped monitoring rollups; a global percentile over 100 TB would
  // use approx_percentile (t-digest, mergeable partials) instead, traded
  // as documented here.
  // ---------------------------------------------------------------------
  def valuePercentiles(spark: SparkSession, dir: String): DataFrame =
    Catalog.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(expr("percentile(value, array(0.5, 0.95))").as("pct"),
        count(lit(1)).as("n"))
      .select(col("event_type"),
        col("pct").getItem(0).as("p50"),
        col("pct").getItem(1).as("p95"),
        col("n"))
      .orderBy(col("event_type"))

  val valuePercentilesSql: String =
    """SELECT event_type,
      | quantile_cont(value, [0.5, 0.95])[1] AS p50,
      | quantile_cont(value, [0.5, 0.95])[2] AS p95,
      | count(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type"""
      .stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // P14 — p13's sketch deployment form with a fully DETERMINISTIC
  // primitive: log2-bucket (HdrHistogram-shape) quantile estimation.
  // p13's exact percentile sorts every group and o2's t-digest is
  // engine-divergent by construction; the fixed log2 histogram is the
  // third point on that curve — MERGEABLE (bucket counts sum), bounded
  // state (≤ 64 counters per group), and the estimate is an integer the
  // DuckDB oracle recomputes EXACTLY (the bitmap_distinct/a12
  // philosophy), with the deterministic guarantee that the true
  // φ-quantile lies inside the reported bucket — value known to one
  // OCTAVE (2×), the monitoring-latency trade HdrHistogram standardized.
  //
  // Plan shape: one codegen'd scan projection (floor + bin-length, no
  // transcendental — the x10 floor-log2 kernel), one map-side-combined
  // (type, bucket) count — ~16 rows per group shuffle — then window
  // arithmetic over the tiny histogram relation. At 100 TB the shuffle
  // ships kilobytes; p13 would sort terabytes per group.
  // ---------------------------------------------------------------------
  val HdrPhis: Seq[Int] = Seq(50, 95, 99)

  /** Log2-bucket quantile estimates over any (event_type, value) frame:
    * for each φ the least bucket whose cumulative count reaches
    * ⌈φ·n/100⌉, with the bucket's [lo, hi] micro-unit value bounds.
    * Buckets key on bitlength(floor(value·1e6)): micro 0 → bucket 1
    * (shared with micro 1 — lo pinned 0), so the mapping is total over
    * non-negative values; negatives are upstream quality-floor work and
    * are filtered (log buckets cover magnitudes).
    */
  /** The p14 bucket kernel — bitlength of the value's micro-units; ONE
    * definition shared by the batch quantile estimator and the streaming
    * histogram twin so the two can never bin differently.
    */
  def hdrBucket(value: Column): Column =
    length(bin(floor(value * lit(1000000.0)).cast("long"))).cast("long")

  def hdrQuantilesOf(events: DataFrame): DataFrame = {
    val hist = events
      .filter(col("value") >= 0)
      .select(col("event_type"), hdrBucket(col("value")).as("bucket"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("c"))
    val byType = Window.partitionBy(col("event_type"))
    hist
      .withColumn("cum", sum(col("c")).over(byType.orderBy(col("bucket"))))
      .withColumn("n", sum(col("c")).over(byType))
      .withColumn("phi", explode(array(HdrPhis.map(lit(_)): _*)))
      .filter(col("cum") >= expr("(phi * n + 99L) div 100L"))
      .groupBy(col("event_type"), col("phi"), col("n"))
      .agg(min(col("bucket")).as("bucket"))
      .select(col("event_type"), col("phi"), col("bucket"),
        expr("CASE WHEN bucket = 1 THEN 0L" +
          " ELSE shiftleft(1L, CAST(bucket - 1 AS INT)) END").as("lo_micro"),
        expr("shiftleft(1L, CAST(bucket AS INT)) - 1L").as("hi_micro"),
        col("n"))
      .orderBy(col("event_type"), col("phi"))
  }

  def hdrQuantiles(spark: SparkSession, dir: String): DataFrame =
    hdrQuantilesOf(Catalog.events(spark, dir))

  val hdrQuantilesSql: String = {
    val phis = HdrPhis.map(p => s"($p)").mkString(", ")
    s"""WITH h AS (
       | SELECT event_type,
       |  length(bin(CAST(floor(value * 1000000.0) AS BIGINT))) AS bucket,
       |  count(*)::BIGINT AS c
       | FROM events WHERE value >= 0 GROUP BY 1, 2),
       |cw AS (SELECT event_type, bucket, c,
       |  CAST(sum(c) OVER (PARTITION BY event_type ORDER BY bucket) AS BIGINT) AS cum,
       |  CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n FROM h),
       |p(phi) AS (VALUES $phis),
       |sel AS (SELECT event_type, phi, n, min(bucket) AS bucket
       | FROM cw CROSS JOIN p WHERE cum >= (phi * n + 99) // 100
       | GROUP BY event_type, phi, n)
       |SELECT event_type, phi, bucket,
       | CASE WHEN bucket = 1 THEN 0
       |  ELSE (CAST(1 AS BIGINT) << CAST(bucket - 1 AS INTEGER)) END AS lo_micro,
       | (CAST(1 AS BIGINT) << CAST(bucket AS INTEGER)) - 1 AS hi_micro, n
       |FROM sel ORDER BY event_type, phi""".stripMargin.replace('\n', ' ')
  }

  // ---------------------------------------------------------------------
  // F2 — JSON extraction: pull a typed field out of a JSON string column
  // and aggregate it (events.props carries the reference's free-form
  // payload; every monitoring store grows one of these). `get_json_object`
  // evaluates per row with no shuffle — the extraction is scan-side work,
  // so a 100 TB scan pays one parse per row and the aggregate shuffles
  // only (type, partial-state). Missing/NULL payloads yield NULL (both
  // engines), counted out by count(k). Pinned divergence on MALFORMED
  // payloads: Spark's get_json_object returns NULL where DuckDB's
  // json_extract raises — the fixture is valid-JSON-only; a deployment
  // ingesting untrusted payloads keeps the Spark (NULL-tolerant) side and
  // must not expect the oracle to run there.
  // ---------------------------------------------------------------------
  def jsonExtractStats(spark: SparkSession, dir: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("int")
    Catalog.events(spark, dir)
      .select(col("event_type"), k.as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_with_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"),
        sum(col("k").cast("long")).as("sum_k"))
      .orderBy(col("event_type"))
  }

  val jsonExtractStatsSql: String =
    """SELECT event_type, count(k) AS n_with_k,
      | min(k) AS min_k, max(k) AS max_k,
      | CAST(sum(k) AS BIGINT) AS sum_k
      |FROM (SELECT event_type,
      |  CAST(json_extract(props, '$.k') AS INTEGER) AS k FROM events) t
      |GROUP BY event_type ORDER BY event_type""".stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // J10 — salted equi-join: the skew-mitigation form of a fact⋈dim join
  // whose dim side is too big to broadcast and whose fact side has hot
  // keys. A plain shuffle join sends every row of a hot key to ONE
  // reducer — at 100 TB a single skewed user/tenant/domain stalls the
  // stage (AQE skew splitting helps per-partition, not per-key). Salting
  // splits each key's rows across R reducers: the fact side derives a
  // deterministic salt in [0, R) from a high-cardinality column (its PK —
  // NOT the join key: same key must land on many salts), the dim side
  // replicates each row once per salt via explode(sequence), and the join
  // key becomes (key, salt). Every fact row still matches each dim row
  // exactly once, so the result IS the plain join — which is what the
  // oracle computes. Cost: R× the dim shuffle volume, the standard trade.
  // ---------------------------------------------------------------------
  /** Salted fact⋈dim inner equi-join; identical rows to
    * `fact.join(dim, factKey === dimKey)`. `saltSource` must be
    * high-cardinality and NON-NULL (a PK): a NULL salt would drop the
    * row, which the plain join would keep.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame,
      factKey: Column, dimKey: Column,
      saltSource: Column, salts: Int): DataFrame = {
    val sf = fact.withColumn("graft_fact_salt", pmod(hash(saltSource), lit(salts)))
    // shuffle_hash hint: the whole point is the non-broadcast plan; the
    // replicated dim builds R small hash tables instead of one hot one
    val sd = dim.withColumn("graft_dim_salt",
      explode(sequence(lit(0), lit(salts - 1)))).hint("shuffle_hash")
    sf.join(sd, factKey === dimKey &&
        col("graft_fact_salt") === col("graft_dim_salt"))
      .drop("graft_fact_salt", "graft_dim_salt")
  }

  /** Salt fan-out for the registered query — the gate default. A
    * deployment derives R from persisted statistics instead
    * ([[saltsForTable]]); the static oracle SQL pins this one.
    */
  val JoinSalts = 8

  /** Rows one reducer should own for a single hot key (~1M narrow fact
    * rows ≈ tens of MB of build/probe work): small enough that the
    * hottest key's slice finishes with its stage, large enough that the
    * R× dim replication stays cheap.
    */
  val SaltTaskRowBudget: Long = 1L * 1000 * 1000

  /** The salt-sizing formula as code (the z4 `shardBucketsFor` discipline
    * applied to j10): R = ceil(hottest key's rows / per-task budget).
    * 1 when no key outgrows a task (salting pure overhead — skip it);
    * capped at 1024 because beyond that the R× dim replication dominates
    * and the dim side should be pre-partitioned or the key pre-split
    * instead.
    */
  def saltsFor(hotKeyRows: Long,
      perTaskBudget: Long = SaltTaskRowBudget): Int = {
    val need = math.ceil(
      math.max(hotKeyRows, 0L).toDouble / math.max(perTaskBudget, 1L)).toLong
    math.min(math.max(need, 1L), 1024L).toInt
  }

  /** Stats-driven fan-out: size R from the fact table's persisted ANALYZE
    * statistics ([[graft.lifecycle.Stats.hotKeyRows]] of the join-key
    * column) — the cost knowledge a 100 TB deployment already maintains
    * re-entering the skew decision, exactly as `Stats.maybeBroadcast`
    * does for the broadcast decision. Falls back to the gate default when
    * the table was never analyzed (or predates hot-key stats).
    */
  def saltsForTable(spark: SparkSession, factTablePath: String,
      keyColumn: String, perTaskBudget: Long = SaltTaskRowBudget,
      default: Int = JoinSalts): Int =
    graft.lifecycle.Stats.hotKeyRows(spark, factTablePath, keyColumn)
      .map(saltsFor(_, perTaskBudget)).getOrElse(default)

  /** Average point rows one grid cell should hold in the j9/j11 interval
    * joins (~250k narrow (id, ts) rows ≈ a few MB of probe-side hash
    * work): small enough that a cell's population joins within a task,
    * large enough that intervals don't explode across thousands of cells.
    */
  val CellRowBudget: Long = 250L * 1000

  /** The grid-cell-width-sizing formula as code ([[saltsFor]]'s discipline
    * applied to the j9/j11/b5 fixed widths): given the observed timestamp
    * span and row count of the POINT side, choose the width so an
    * average-density cell holds ~`perCellBudget` points —
    * `width = span · budget / rows`. A deployment whose intervals are
    * much longer than this width should widen toward the interval length
    * instead (the fan-out bound is `len/width + 1`); the clamp floors at
    * 1 s (sub-second grids churn fan-out for nothing) and caps at one
    * year (beyond that the grid degenerates to a single cell anyway).
    * Non-positive span/rows (empty or constant-ts tables) fall back to
    * the gate default.
    */
  def cellSecondsFor(spanSeconds: Long, rows: Long,
      perCellBudget: Long = CellRowBudget,
      default: Long = RangeBucketSec): Long =
    if (spanSeconds <= 0L || rows <= 0L) default
    else {
      val w = spanSeconds.toDouble * math.max(perCellBudget, 1L) / rows
      math.min(math.max(math.round(w), 1L), 86400L * 365)
    }

  /** Stats-driven grid width: size the j9 cell from the point table's
    * persisted ANALYZE statistics (min/max of the timestamp column +
    * row count) — the [[saltsForTable]] pattern for the interval-join
    * family. Falls back to the gate default when the table was never
    * analyzed or the column's recorded bounds don't parse as timestamps.
    */
  def cellSecondsForTable(spark: SparkSession, pointTablePath: String,
      tsColumn: String, perCellBudget: Long = CellRowBudget,
      default: Long = RangeBucketSec): Long =
    (for {
      (mn, mx) <- graft.lifecycle.Stats.minMax(spark, pointTablePath, tsColumn)
      rows <- graft.lifecycle.Stats.rowCount(spark, pointTablePath)
      span <- try {
        // analyze stored `min(ts).cast("string")` — Spark's UTC-session
        // rendering, which java.sql.Timestamp.valueOf parses back exactly
        Some((java.sql.Timestamp.valueOf(mx).getTime -
          java.sql.Timestamp.valueOf(mn).getTime) / 1000L)
      } catch { case _: IllegalArgumentException => None }
    } yield cellSecondsFor(span, rows, perCellBudget, default))
      .getOrElse(default)

  def saltedSegmentActivity(spark: SparkSession, dir: String): DataFrame = {
    val ev = Catalog.events(spark, dir)
    val cust = Catalog.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    saltedJoin(ev, cust, col("user_id"), col("c_custkey"),
        col("event_id"), JoinSalts)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("c_mktsegment"))
  }

  val saltedSegmentActivitySql: String =
    """SELECT c_mktsegment, count(*) AS n_events,
      | count(DISTINCT user_id) AS n_users
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // O1 — robust outlier accounting per group: Tukey fences on the exact
  // interpolated quartiles (lo = q1 − 1.5·IQR, hi = q3 + 1.5·IQR) and a
  // per-type count of metric values outside them — the standard
  // distribution-drift / bad-sensor sweep over a metric stream, and the
  // numeric twin of x2's text-quality pre-filter. Determinism: quartiles
  // are p13's exact interpolation; fences are plain IEEE +/×, no
  // transcendental, so the hash matches with NO rounding. Plan: the
  // per-type fence relation is a tiny aggregate broadcast back onto one
  // more column-pruned scan — two scans, map-side conditional count,
  // no corpus-sized shuffle (partial aggs only).
  // ---------------------------------------------------------------------
  def outlierBounds(spark: SparkSession, dir: String): DataFrame =
    outlierBoundsOf(Catalog.events(spark, dir))

  /** The per-type Tukey fence relation (event_type, lo_bound, hi_bound)
    * — shared by the batch accounting (o1) and the streaming in-flight
    * filter ([[graft.streaming.Streams.streamingFenceFilter]]), so batch
    * and stream agree on what an outlier is.
    */
  def tukeyFences(events: DataFrame): DataFrame = {
    val (lo, hi) = fenceBounds(col("q"))
    events
      .groupBy(col("event_type"))
      .agg(expr("percentile(value, array(0.25, 0.75))").as("q"))
      .select(col("event_type"), lo.as("lo_bound"), hi.as("hi_bound"))
  }

  /** Tukey's fences from a [q1, q3] quartile array — ONE definition of
    * the arithmetic so the exact (o1), approx (o2), and streaming
    * consumers can never disagree on what an outlier is.
    */
  private def fenceBounds(q: Column): (Column, Column) = {
    val q1 = q.getItem(0)
    val q3 = q.getItem(1)
    (q1 - (q3 - q1) * 1.5, q3 + (q3 - q1) * 1.5)
  }

  /** Fence core over any (event_type, value) frame (specs inject
    * hand-built distributions).
    */
  def outlierBoundsOf(events: DataFrame): DataFrame = {
    val fences = tukeyFences(events)
    events
      .join(broadcast(fences), "event_type")
      .groupBy(col("event_type"), col("lo_bound"), col("hi_bound"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") < col("lo_bound") ||
          col("value") > col("hi_bound"), 1L).otherwise(0L)).as("n_outliers"))
      .select(col("event_type"), col("n"), col("n_outliers"),
        col("lo_bound"), col("hi_bound"))
      .orderBy(col("event_type"))
  }

  val outlierBoundsSql: String =
    """WITH f AS (
      | SELECT event_type,
      |  quantile_cont(value, [0.25, 0.75])[1] AS q1,
      |  quantile_cont(value, [0.25, 0.75])[2] AS q3
      | FROM events GROUP BY event_type)
      |SELECT event_type, count(*) AS n,
      | CAST(sum(CASE WHEN value < q1 - (q3 - q1) * 1.5
      |   OR value > q3 + (q3 - q1) * 1.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      | q1 - (q3 - q1) * 1.5 AS lo_bound,
      | q3 + (q3 - q1) * 1.5 AS hi_bound
      |FROM events JOIN f USING (event_type)
      |GROUP BY event_type, q1, q3 ORDER BY event_type"""
      .stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // O2 — o1's 100 TB deployment form, driver-executed: fences from
  // approx_percentile (bounded rank error ≤ n/accuracy, mergeable
  // fixed-size partials, no per-group value buffering) instead of the
  // exact interpolated quartiles — the exact→approx swap SCALE.md
  // documents for o1/p13, run by the gate instead of living in prose.
  // Approx fences can't hash-match DuckDB, so the deployment claim rides
  // as data: the outlier count under the approx fences must agree with
  // the exact count within max(3, 10%), a boolean the oracle pins to
  // `true` — a broken approx path goes hash-red, not invisibly
  // rows-green. The exact arm exists only to judge the approx one.
  // ---------------------------------------------------------------------
  val ApproxPercentileAccuracy = 10000

  def outlierBoundsApprox(spark: SparkSession, dir: String): DataFrame =
    outlierBoundsApproxOf(Catalog.events(spark, dir))

  /** o2 core over any (event_type, value) frame. */
  def outlierBoundsApproxOf(events: DataFrame): DataFrame = {
    val (loA, hiA) = fenceBounds(col("q"))
    val approxF = events
      .groupBy(col("event_type"))
      .agg(expr(s"approx_percentile(value, array(0.25, 0.75), $ApproxPercentileAccuracy)").as("q"))
      .select(col("event_type"), loA.as("lo_a"), hiA.as("hi_a"))
    events
      .join(broadcast(tukeyFences(events)), "event_type")
      .join(broadcast(approxF), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") < col("lo_bound") ||
          col("value") > col("hi_bound"), 1L).otherwise(0L)).as("n_outliers"),
        sum(when(col("value") < col("lo_a") ||
          col("value") > col("hi_a"), 1L).otherwise(0L)).as("n_out_approx"))
      .select(col("event_type"), col("n"), col("n_outliers"),
        (abs(col("n_out_approx") - col("n_outliers")) <=
          greatest(lit(3.0), col("n_outliers") * 0.1)).as("approx_agrees"))
      .orderBy(col("event_type"))
  }

  val outlierBoundsApproxSql: String =
    """WITH f AS (
      | SELECT event_type,
      |  quantile_cont(value, [0.25, 0.75])[1] AS q1,
      |  quantile_cont(value, [0.25, 0.75])[2] AS q3
      | FROM events GROUP BY event_type)
      |SELECT event_type, count(*) AS n,
      | CAST(sum(CASE WHEN value < q1 - (q3 - q1) * 1.5
      |   OR value > q3 + (q3 - q1) * 1.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      | true AS approx_agrees
      |FROM events JOIN f USING (event_type)
      |GROUP BY event_type, q1, q3 ORDER BY event_type"""
      .stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // O3 — MAD (median absolute deviation) robust outliers: the
  // breakdown-resistant companion to o1's Tukey fences. Quartile fences
  // move when HALF the tail is junk; the MAD's 50% breakdown point
  // survives grossly contaminated feeds (Hampel's identifier — the
  // robust-statistics standard for exactly the bad-sensor case o1
  // screens for). Outlier: |x − med| > mad·1.4826·3 (the Gaussian
  // consistency constant, written in the SAME multiplication order in
  // both engines — float products are order-sensitive).
  //
  // Plan: three tiny-agg-broadcast-rescan passes (o1 pays two) — median
  // per type, MAD per type over the deviation rescans, then the
  // conditional count; every aggregate is per-type-tiny and every
  // corpus-sized pass is map-side. The exact→approx percentile swap is
  // o1/o2's documented trade.
  // ---------------------------------------------------------------------
  def madOutliersOf(events: DataFrame): DataFrame = {
    val med = events.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("med"))
    val mad = events.join(broadcast(med), "event_type")
      .groupBy(col("event_type"))
      .agg(expr("percentile(abs(value - med), 0.5)").as("mad"))
    events.join(broadcast(med), "event_type")
      .join(broadcast(mad), "event_type")
      .groupBy(col("event_type"), col("med"), col("mad"))
      .agg(count(lit(1)).as("n"),
        sum(when(abs(col("value") - col("med")) > col("mad") * 1.4826 * 3,
          1L).otherwise(0L)).as("n_outliers"))
      .select(col("event_type"), col("n"), col("n_outliers"),
        col("med"), col("mad"))
      .orderBy(col("event_type"))
  }

  def madOutliers(spark: SparkSession, dir: String): DataFrame =
    madOutliersOf(Catalog.events(spark, dir))

  val madOutliersSql: String =
    """WITH m AS (
      | SELECT event_type, quantile_cont(value, 0.5) AS med
      | FROM events GROUP BY event_type),
      |md AS (
      | SELECT event_type, quantile_cont(abs(value - med), 0.5) AS mad
      | FROM events JOIN m USING (event_type) GROUP BY event_type)
      |SELECT event_type, count(*) AS n,
      | CAST(sum(CASE WHEN abs(value - med) > mad * 1.4826 * 3
      |   THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      | med, mad
      |FROM events JOIN m USING (event_type) JOIN md USING (event_type)
      |GROUP BY event_type, med, mad ORDER BY event_type"""
      .stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // H2 — per-type equal-width value histograms: the distribution snapshot
  // that pairs with o1's fences (drift shows up as mass moving between
  // buckets before it crosses a fence). Two passes, o1's shape: per-type
  // [min, max] is a tiny aggregate broadcast back onto a second
  // column-pruned scan; bucket assignment is plain IEEE arithmetic
  // (floor((v−lo)/w), capped into the last bucket so v = max lands in
  // bucket B−1), so the hash matches with no rounding. A degenerate
  // distribution (min = max ⇒ w = 0) puts all mass in bucket 0 by
  // definition instead of dividing by zero. NULL values are excluded —
  // they are o1/c1's accounting, not distribution mass.
  // ---------------------------------------------------------------------
  val HistBuckets = 10

  /** h2's equal-width bucket assignment over per-type [lo, hi] — ONE
    * definition so h3's drift layout can never diverge from h2's
    * histogram (their comparability is h3's whole premise).
    */
  private def bucketOf(value: Column, lo: Column, hi: Column): Column = {
    val w = (hi - lo) / HistBuckets
    when(hi === lo, 0L)
      .otherwise(least(floor((value - lo) / w).cast("long"),
        lit(HistBuckets - 1L)))
  }

  def valueHistogramOf(events: DataFrame): DataFrame = {
    val bounds = events
      .groupBy(col("event_type"))
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
    val bucket = bucketOf(col("value"), col("lo"), col("hi"))
    events.filter(col("value").isNotNull)
      .join(broadcast(bounds), "event_type")
      .groupBy(col("event_type"), bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"), col("bucket"))
  }

  def valueHistogram(spark: SparkSession, dir: String): DataFrame =
    valueHistogramOf(Catalog.events(spark, dir))

  val valueHistogramSql: String =
    s"""WITH b AS (
       | SELECT event_type, min(value) AS lo, max(value) AS hi
       | FROM events GROUP BY event_type)
       |SELECT event_type,
       | CASE WHEN hi = lo THEN 0
       |  ELSE least(floor((value - lo) / ((hi - lo) / $HistBuckets))::BIGINT, ${HistBuckets - 1})
       | END AS bucket,
       | count(*) AS n
       |FROM events JOIN b USING (event_type)
       |WHERE value IS NOT NULL
       |GROUP BY event_type, bucket ORDER BY event_type, bucket"""
      .stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // H3 — histogram DRIFT between two corpus snapshots: h2's equal-width
  // layout with the bounds SHARED across both snapshots (per-type
  // [min, max] over their union — per-snapshot bounds would misalign the
  // buckets and manufacture drift), masses counted per (snapshot, type,
  // bucket), and the per-type L1 distance Σ|n_old − n_new| reported in
  // exact integer counts, so the hash matches with no rounding. This is
  // the day-over-day distribution check that catches mass moving BETWEEN
  // buckets before anything crosses an o1 fence. Plan: ONE flagged pass
  // over the rows instead of one scan per snapshot — each row
  // contributes its (0/1, 0/1) membership pair to a single
  // partial-aggregated rollup, the only shuffled relation is
  // (types × buckets) rows, and the union bounds are h2's tiny
  // broadcast pre-pass. Snapshot views are u1's deterministic event
  // slices.
  // ---------------------------------------------------------------------
  def histogramDrift(spark: SparkSession, dir: String): DataFrame =
    histogramDriftOf(Catalog.events(spark, dir),
      col("event_id") % 7 =!= 0, col("event_id") % 5 =!= 0)

  /** h3 core: drift of `inNew`'s value distribution against `inOld`'s
    * over any frame carrying (event_type, value) — the membership flags
    * are arbitrary row predicates (a dt-partitioned deployment passes
    * day predicates and the scan prunes to the two days).
    */
  def histogramDriftOf(events: DataFrame, inOld: Column,
      inNew: Column): DataFrame = {
    val rows = events.filter(col("value").isNotNull && (inOld || inNew))
    val bounds = rows
      .groupBy(col("event_type"))
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
    val bucket = bucketOf(col("value"), col("lo"), col("hi"))
    rows
      .join(broadcast(bounds), "event_type")
      .groupBy(col("event_type"), bucket.as("bucket"))
      .agg(sum(when(inOld, 1L).otherwise(0L)).as("b_old"),
        sum(when(inNew, 1L).otherwise(0L)).as("b_new"))
      .groupBy(col("event_type"))
      .agg(sum(col("b_old")).cast("long").as("n_old"),
        sum(col("b_new")).cast("long").as("n_new"),
        sum(abs(col("b_old") - col("b_new"))).cast("long").as("l1_drift"),
        sum(when(col("b_old") =!= col("b_new"), 1L).otherwise(0L))
          .cast("long").as("n_buckets_changed"))
      .orderBy(col("event_type"))
  }

  val histogramDriftSql: String =
    s"""WITH e AS (
       | SELECT event_type, value,
       |  CASE WHEN event_id % 7 <> 0 THEN 1 ELSE 0 END AS in_old,
       |  CASE WHEN event_id % 5 <> 0 THEN 1 ELSE 0 END AS in_new
       | FROM events
       | WHERE value IS NOT NULL AND (event_id % 7 <> 0 OR event_id % 5 <> 0)),
       |b AS (SELECT event_type, min(value) AS lo, max(value) AS hi
       | FROM e GROUP BY event_type),
       |h AS (
       | SELECT event_type,
       |  CASE WHEN hi = lo THEN 0
       |   ELSE least(floor((value - lo) / ((hi - lo) / $HistBuckets))::BIGINT, ${HistBuckets - 1})
       |  END AS bucket,
       |  CAST(sum(in_old) AS BIGINT) AS b_old,
       |  CAST(sum(in_new) AS BIGINT) AS b_new
       | FROM e JOIN b USING (event_type) GROUP BY event_type, bucket)
       |SELECT event_type,
       | CAST(sum(b_old) AS BIGINT) AS n_old,
       | CAST(sum(b_new) AS BIGINT) AS n_new,
       | CAST(sum(abs(b_old - b_new)) AS BIGINT) AS l1_drift,
       | CAST(sum(CASE WHEN b_old <> b_new THEN 1 ELSE 0 END) AS BIGINT) AS n_buckets_changed
       |FROM h GROUP BY event_type ORDER BY event_type"""
      .stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // O4 — exact two-sample Kolmogorov–Smirnov drift per metric type: the
  // DISTRIBUTION-level companion to h3's bucket L1. The KS statistic
  // D = max_x |F_old(x) − F_new(x)| is the classic drift test (binning-
  // free, sensitive anywhere on the CDF — h3 only sees mass that crosses
  // one of its 10 bucket edges). Snapshot membership reuses h3's flag
  // predicates so the two tests are directly comparable on the same
  // slices.
  //
  // Cross-engine determinism (the x10/BM25 lesson): the supremum is
  // computed as an INTEGER — at each distinct value,
  // |cum_old·n_new − cum_new·n_old| (the CDF gap cleared of both
  // denominators), maxed exactly, and only then divided once
  // (IEEE division of exactly-representable integers) and scaled to
  // micro-points, round half-up in both engines.
  //
  // Plan shape: one flagged scan collapses to distinct (type, value)
  // rows with per-snapshot counts (map-side partials), the ECDF is a
  // running-sum window per type over those DISTINCT values, and the
  // output is one row per type. At 100 TB the per-type sort of distinct
  // values is the bottleneck; the documented swap is the binned ECDF on
  // h2's shared-bounds grid (D within one bucket's mass), or quantile
  // sketches (KLL) when n_old·n_new nears BIGINT range.
  // ---------------------------------------------------------------------
  def ksDrift(spark: SparkSession, dir: String): DataFrame =
    ksDriftOf(Catalog.events(spark, dir),
      col("event_id") % 7 =!= 0, col("event_id") % 5 =!= 0)

  /** o4 core: exact KS drift of `inNew`'s value distribution against
    * `inOld`'s over any frame carrying (event_type, value).
    */
  def ksDriftOf(events: DataFrame, inOld: Column, inNew: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = events.filter(col("value").isNotNull && (inOld || inNew))
      .groupBy(col("event_type"), col("value"))
      .agg(sum(when(inOld, 1L).otherwise(0L)).as("c_old"),
        sum(when(inNew, 1L).otherwise(0L)).as("c_new"))
    val cum = Window.partitionBy(col("event_type")).orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(col("event_type"))
    g.withColumn("cum_old", sum(col("c_old")).over(cum))
      .withColumn("cum_new", sum(col("c_new")).over(cum))
      .withColumn("n_old", sum(col("c_old")).over(whole))
      .withColumn("n_new", sum(col("c_new")).over(whole))
      .withColumn("gap",
        abs(col("cum_old") * col("n_new") - col("cum_new") * col("n_old")))
      .groupBy(col("event_type"))
      .agg(max(col("n_old")).cast("long").as("n_old"),
        max(col("n_new")).cast("long").as("n_new"),
        max(col("gap")).cast("long").as("d_num"))
      // a type present in only ONE snapshot has no two-sample statistic:
      // ks_ppm is NULL (unknown), not a division by zero that Spark
      // renders as Infinity and DuckDB refuses to cast
      .withColumn("ks_ppm",
        when(col("n_old") > 0 && col("n_new") > 0,
          round(col("d_num").cast("double") /
            (col("n_old") * col("n_new")).cast("double") * 1000000.0, 0)
            .cast("long")))
      .orderBy(col("event_type"))
  }

  // ---------------------------------------------------------------------
  // O8 — o4's documented 100 TB swap EXECUTED as a gate entry (the
  // c2/o2 "claim as data" rule applied to SCALE.md prose): the binned
  // ECDF KS statistic over h2's equal-width grid. o4's per-type sort of
  // DISTINCT values is its scale bottleneck; the binned form needs only
  // the (type, bucket) count relation — ≤ HistBuckets rows per type,
  // map-side combined, no distinct-value sort anywhere.
  //
  // The swap's error is PROVABLE, and the gate pins the proof as data.
  // In cleared-denominator gap units g = |cum_old·n_new − cum_new·n_old|:
  // (1) the binned statistic evaluates g at bucket edges — a subset of
  // the exact supremum's domain — so d_binned ≤ d_exact ALWAYS;
  // (2) within one bucket cum_old moves by ≤ b_old and cum_new by
  // ≤ b_new, and g is monotone in each, so its in-bucket extreme is a
  // rectangle corner: d_exact ≤ d_binned + max_b max(b_old·n_new,
  // b_new·n_old) — one bucket's mass, the SCALE.md claim. Both bounds
  // are exact integer comparisons, hash-pinned `true` by the oracle;
  // the exact arm exists only to judge the binned one (a deployment
  // runs the binned arm alone).
  // ---------------------------------------------------------------------
  def ksBinned(spark: SparkSession, dir: String): DataFrame =
    ksBinnedOf(Catalog.events(spark, dir),
      col("event_id") % 7 =!= 0, col("event_id") % 5 =!= 0)

  /** o8 core: binned KS vs o4's exact statistic over the same snapshot
    * flags, with both error-band booleans emitted as data.
    */
  def ksBinnedOf(events: DataFrame, inOld: Column, inNew: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val slice = events.filter(col("value").isNotNull && (inOld || inNew))
    // shared-bounds grid over the UNION slice (h2's two-pass shape) so
    // both snapshots bin identically — per-snapshot bounds would not be
    // a comparable ECDF domain
    val bounds = slice.groupBy(col("event_type"))
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
    val binned = slice
      .join(broadcast(bounds), "event_type")
      .groupBy(col("event_type"),
        bucketOf(col("value"), col("lo"), col("hi")).as("bucket"))
      .agg(sum(when(inOld, 1L).otherwise(0L)).as("b_old"),
        sum(when(inNew, 1L).otherwise(0L)).as("b_new"))
    val cum = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(col("event_type"))
    val perType = binned
      .withColumn("cum_old", sum(col("b_old")).over(cum))
      .withColumn("cum_new", sum(col("b_new")).over(cum))
      .withColumn("n_old", sum(col("b_old")).over(whole))
      .withColumn("n_new", sum(col("b_new")).over(whole))
      .groupBy(col("event_type"))
      .agg(max(col("n_old")).cast("long").as("n_old"),
        max(col("n_new")).cast("long").as("n_new"),
        max(abs(col("cum_old") * col("n_new") -
          col("cum_new") * col("n_old"))).cast("long").as("d_binned"),
        max(greatest(col("b_old") * col("n_new"),
          col("b_new") * col("n_old"))).cast("long").as("bucket_mass"))
    val exact = ksDriftOf(events, inOld, inNew)
      .select(col("event_type"), col("d_num").as("d_exact"))
    perType.join(exact, "event_type")
      .select(col("event_type"), col("n_old"), col("n_new"),
        col("d_binned"), col("d_exact"), col("bucket_mass"),
        (col("d_binned") <= col("d_exact")).as("binned_never_over"),
        (col("d_exact") <= col("d_binned") + col("bucket_mass"))
          .as("exact_within_bucket_mass"))
      .orderBy(col("event_type"))
  }

  val ksBinnedSql: String =
    s"""WITH e AS (
       | SELECT event_type, value,
       |  CASE WHEN event_id % 7 <> 0 THEN 1 ELSE 0 END AS in_old,
       |  CASE WHEN event_id % 5 <> 0 THEN 1 ELSE 0 END AS in_new
       | FROM events
       | WHERE value IS NOT NULL AND (event_id % 7 <> 0 OR event_id % 5 <> 0)),
       |bo AS (SELECT event_type, min(value) AS lo, max(value) AS hi
       | FROM e GROUP BY event_type),
       |bi AS (
       | SELECT event_type,
       |  CASE WHEN hi = lo THEN 0 ELSE least(
       |   CAST(floor((value - lo) / ((hi - lo) / $HistBuckets)) AS BIGINT),
       |   ${HistBuckets - 1}) END AS bucket,
       |  CAST(sum(in_old) AS BIGINT) AS b_old,
       |  CAST(sum(in_new) AS BIGINT) AS b_new
       | FROM e JOIN bo USING (event_type) GROUP BY 1, 2),
       |c AS (
       | SELECT event_type, b_old, b_new,
       |  sum(b_old) OVER (PARTITION BY event_type ORDER BY bucket
       |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_old,
       |  sum(b_new) OVER (PARTITION BY event_type ORDER BY bucket
       |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_new,
       |  sum(b_old) OVER (PARTITION BY event_type) AS n_old,
       |  sum(b_new) OVER (PARTITION BY event_type) AS n_new
       | FROM bi),
       |bt AS (
       | SELECT event_type,
       |  CAST(max(n_old) AS BIGINT) AS n_old,
       |  CAST(max(n_new) AS BIGINT) AS n_new,
       |  CAST(max(abs(cum_old*n_new - cum_new*n_old)) AS BIGINT) AS d_binned,
       |  CAST(max(greatest(b_old*n_new, b_new*n_old)) AS BIGINT) AS bucket_mass
       | FROM c GROUP BY event_type),
       |g AS (
       | SELECT event_type, value,
       |  CAST(sum(in_old) AS BIGINT) AS c_old,
       |  CAST(sum(in_new) AS BIGINT) AS c_new
       | FROM e GROUP BY event_type, value),
       |x AS (
       | SELECT event_type,
       |  sum(c_old) OVER (PARTITION BY event_type ORDER BY value
       |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_old,
       |  sum(c_new) OVER (PARTITION BY event_type ORDER BY value
       |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_new,
       |  sum(c_old) OVER (PARTITION BY event_type) AS n_old,
       |  sum(c_new) OVER (PARTITION BY event_type) AS n_new
       | FROM g),
       |xt AS (
       | SELECT event_type,
       |  CAST(max(abs(cum_old*n_new - cum_new*n_old)) AS BIGINT) AS d_exact
       | FROM x GROUP BY event_type)
       |SELECT event_type, n_old, n_new, d_binned, d_exact, bucket_mass,
       | d_binned <= d_exact AS binned_never_over,
       | d_exact <= d_binned + bucket_mass AS exact_within_bucket_mass
       |FROM bt JOIN xt USING (event_type)
       |ORDER BY event_type""".stripMargin.replace('\n', ' ')

  val ksDriftSql: String =
    """WITH e AS (
      | SELECT event_type, value,
      |  CASE WHEN event_id % 7 <> 0 THEN 1 ELSE 0 END AS in_old,
      |  CASE WHEN event_id % 5 <> 0 THEN 1 ELSE 0 END AS in_new
      | FROM events
      | WHERE value IS NOT NULL AND (event_id % 7 <> 0 OR event_id % 5 <> 0)),
      |g AS (
      | SELECT event_type, value,
      |  CAST(sum(in_old) AS BIGINT) AS c_old,
      |  CAST(sum(in_new) AS BIGINT) AS c_new
      | FROM e GROUP BY event_type, value),
      |c AS (
      | SELECT event_type,
      |  sum(c_old) OVER (PARTITION BY event_type ORDER BY value
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_old,
      |  sum(c_new) OVER (PARTITION BY event_type ORDER BY value
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_new,
      |  sum(c_old) OVER (PARTITION BY event_type) AS n_old,
      |  sum(c_new) OVER (PARTITION BY event_type) AS n_new
      | FROM g)
      |SELECT event_type,
      | CAST(max(n_old) AS BIGINT) AS n_old,
      | CAST(max(n_new) AS BIGINT) AS n_new,
      | CAST(max(abs(cum_old*n_new - cum_new*n_old)) AS BIGINT) AS d_num,
      | CAST(round(CAST(max(abs(cum_old*n_new - cum_new*n_old)) AS DOUBLE)
      |  / CAST(max(n_old)*max(n_new) AS DOUBLE) * 1000000.0, 0) AS BIGINT) AS ks_ppm
      |FROM c GROUP BY event_type ORDER BY event_type"""
      .stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // O5 — SEASONAL anomaly baselines: o3's robust rule conditioned on the
  // hour of day. A global fence calls every evening traffic spike an
  // anomaly and sleeps through a 3 a.m. surge that is 10× its hour's
  // norm — real monitoring baselines are per (metric, hour-of-day)
  // (the daily-seasonality standard behind every alerting product's
  // "compared to this time yesterday"). Baseline = median + MAD per
  // (event_type, hour); anomaly = |x − med| > mad·1.4826·3 against the
  // event's OWN hour slot (Hampel, o3's constant, same multiplication
  // order both engines).
  //
  // Plan/scale shape: o3's tiny-agg-broadcast-rescan with a wider key —
  // the baseline relation is |types|·24 rows however large the corpus,
  // broadcast back onto map-side rescans; the exact→approx percentile
  // swap is the o1/o2 documented trade. The registered output is the
  // per-slot accounting (one row per baseline cell), the shape an
  // alerting rule engine loads.
  // ---------------------------------------------------------------------
  def seasonalAnomalyOf(events: DataFrame): DataFrame = {
    val keyed = events.filter(col("value").isNotNull)
      .withColumn("hour", hour(col("ts")).cast("long"))
    val med = keyed.groupBy(col("event_type"), col("hour"))
      .agg(expr("percentile(value, 0.5)").as("med"))
    val mad = keyed.join(broadcast(med), Seq("event_type", "hour"))
      .groupBy(col("event_type"), col("hour"))
      .agg(expr("percentile(abs(value - med), 0.5)").as("mad"))
    keyed.join(broadcast(med), Seq("event_type", "hour"))
      .join(broadcast(mad), Seq("event_type", "hour"))
      .groupBy(col("event_type"), col("hour"), col("med"), col("mad"))
      .agg(count(lit(1)).as("n"),
        sum(when(abs(col("value") - col("med")) > col("mad") * 1.4826 * 3,
          1L).otherwise(0L)).as("n_anomalies"))
      .select(col("event_type"), col("hour"), col("n"),
        col("n_anomalies"), col("med"), col("mad"))
      .orderBy(col("event_type"), col("hour"))
  }

  def seasonalAnomaly(spark: SparkSession, dir: String): DataFrame =
    seasonalAnomalyOf(Catalog.events(spark, dir))

  val seasonalAnomalySql: String =
    """WITH e AS (
      | SELECT event_type, CAST(hour(ts) AS BIGINT) AS hour, value
      | FROM events WHERE value IS NOT NULL),
      |m AS (
      | SELECT event_type, hour, quantile_cont(value, 0.5) AS med
      | FROM e GROUP BY event_type, hour),
      |md AS (
      | SELECT event_type, hour, quantile_cont(abs(value - med), 0.5) AS mad
      | FROM e JOIN m USING (event_type, hour) GROUP BY event_type, hour)
      |SELECT event_type, hour, count(*) AS n,
      | CAST(sum(CASE WHEN abs(value - med) > mad * 1.4826 * 3
      |   THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
      | med, mad
      |FROM e JOIN m USING (event_type, hour) JOIN md USING (event_type, hour)
      |GROUP BY event_type, hour, med, mad
      |ORDER BY event_type, hour""".stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // O6 — CUSUM level-shift detection per metric type: o4/h3 compare two
  // named snapshots; CUSUM watches the SEQUENCE — the cumulative sum of
  // deviations from the series mean, whose running maximum spikes when a
  // level shift begins long before any single day trips a fence (Page
  // 1954, the classic sequential change detector).
  //
  // The textbook recurrence S_t = max(0, S_{t−1} + d_t) is sequential —
  // useless verbatim on a shuffle engine. But its closed form is the
  // maximal-suffix-sum: S_t = P_t − min(0, min_{j<t} P_j) over prefix
  // sums P, so max_t S_t (the alarm statistic) needs exactly TWO window
  // passes per key — a running sum and a preceding-extremum — and a
  // terminal max. The downward detector is the mirror on −d. No loop,
  // no state, no UDAF.
  //
  // Cross-engine determinism (the x10 lesson): deviations are cleared of
  // the mean's denominator — d_t = n·x_t − Σx, an exact BIGINT that sums
  // to zero over the series — so the statistic is integer-exact in units
  // of 1/n events; consumers divide by n once at read time if they want
  // event units.
  //
  // Plan shape: one map-side-partial shuffle to (type, day) counts, then
  // windows over the |types|·|days| daily relation (tiny however large
  // the corpus — the same collapse-then-window shape as o4's ECDF), one
  // output row per type.
  // ---------------------------------------------------------------------
  def cusumDriftOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // a timestamp-less event has no place in a daily series (and NULL
    // ordering inside window ORDER BY differs across engines)
    val daily = events.filter(col("ts").isNotNull)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val byType = Window.partitionBy(col("event_type"))
    val ord = byType.orderBy(col("day"))
    val prior = ord.rowsBetween(Window.unboundedPreceding, -1)
    val series = daily
      .withColumn("n_days", count(lit(1)).over(byType))
      .withColumn("total", sum(col("x")).over(byType))
      .withColumn("d", col("n_days") * col("x") - col("total"))
    val scan = series
      .withColumn("p", sum(col("d")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // the empty prefix (P_0 = 0) participates in both extrema (an
      // interval may start at t itself). The extremum window excludes the
      // current row, so a per-row value may dip below the true S_t ≥ 0 —
      // but the TERMINAL max is identical: true S_t = max(value_t, 0),
      // and the value at t = n is −min(0, min P) ≥ 0 because the
      // mean-cleared series closes at P_n = 0, so the row-wise max is
      // already ≥ 0 and the clamp changes nothing.
      .withColumn("minp", least(lit(0L), coalesce(min(col("p")).over(prior), lit(0L))))
      .withColumn("maxp", greatest(lit(0L), coalesce(max(col("p")).over(prior), lit(0L))))
    scan.groupBy(col("event_type"))
      .agg(max(col("n_days")).as("n_days"),
        max(col("total")).as("total_events"),
        max(col("p") - col("minp")).as("cusum_up"),
        max(col("maxp") - col("p")).as("cusum_down"))
      .orderBy(col("event_type"))
  }

  def cusumDrift(spark: SparkSession, dir: String): DataFrame =
    cusumDriftOf(Catalog.events(spark, dir))

  val cusumDriftSql: String =
    """WITH dly AS (
      | SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS x
      | FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
      |s AS (
      | SELECT event_type, day, x,
      |  count(*) OVER (PARTITION BY event_type) AS n_days,
      |  CAST(sum(x) OVER (PARTITION BY event_type) AS BIGINT) AS total
      | FROM dly),
      |pp AS (
      | SELECT event_type, day, n_days, total,
      |  CAST(sum(n_days*x - total) OVER (PARTITION BY event_type ORDER BY day
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p
      | FROM s),
      |sc AS (
      | SELECT event_type, n_days, total, p,
      |  least(0, CAST(coalesce(min(p) OVER (PARTITION BY event_type ORDER BY day
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)) AS minp,
      |  greatest(0, CAST(coalesce(max(p) OVER (PARTITION BY event_type ORDER BY day
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)) AS maxp
      | FROM pp)
      |SELECT event_type,
      | CAST(max(n_days) AS BIGINT) AS n_days,
      | CAST(max(total) AS BIGINT) AS total_events,
      | CAST(max(p - minp) AS BIGINT) AS cusum_up,
      | CAST(max(maxp - p) AS BIGINT) AS cusum_down
      |FROM sc GROUP BY event_type ORDER BY event_type"""
      .stripMargin.replace('\n', ' ')

  // ---------------------------------------------------------------------
  // O7 — change-point LOCALIZATION per metric type: o6 answers "did the
  // level shift?" (the alarm statistic); o7 answers WHEN — the day t*
  // maximizing |P_t| over the mean-centered prefix sums, the standard
  // CUSUM change-point estimator (argmax of the centered cumsum; t* is
  // the last day of the old regime). Exactness: P_t = n·cum_t − t·S is
  // the o6 integer (units of 1/n events), argmax ranks by
  // (|P_t| DESC, day ASC) — a total order, no division anywhere; the
  // reported segment means divide ONCE into floor'd micro-units
  // (positive operands, so Spark `div` and DuckDB `//` agree). Types
  // with a single day have no split candidate (n−t would be 0) and are
  // excluded; t* = n is impossible beyond that because P_n = 0 exactly.
  //
  // Plan: the same collapse-then-window shape as o6 — one map-side
  // partial shuffle to (type, day), windows over the tiny daily
  // relation, one row per type. BIGINT headroom: 1e6·cum overflows past
  // ~9e12 events per type; a deployment at that scale moves the mean
  // report to DECIMAL(38,0), the z10 discipline.
  // ---------------------------------------------------------------------
  def changePointOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events.filter(col("ts").isNotNull)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val byType = Window.partitionBy(col("event_type"))
    val ord = byType.orderBy(col("day"))
    val series = daily
      .withColumn("n_days", count(lit(1)).over(byType))
      .withColumn("total", sum(col("x")).over(byType))
      .withColumn("t", row_number().over(ord).cast("long"))
      .withColumn("cum", sum(col("x")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("p", col("n_days") * col("cum") - col("t") * col("total"))
    series.filter(col("n_days") >= 2)
      .withColumn("rk", row_number().over(
        byType.orderBy(abs(col("p")).desc, col("day"))))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("n_days"), col("day").as("change_day"),
        abs(col("p")).as("split_stat"),
        expr("(1000000 * cum) div t").as("mean_before_micro"),
        expr("(1000000 * (total - cum)) div (n_days - t)").as("mean_after_micro"))
      .orderBy(col("event_type"))
  }

  def changePoint(spark: SparkSession, dir: String): DataFrame =
    changePointOf(Catalog.events(spark, dir))

  val changePointSql: String =
    """WITH dly AS (
      | SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS x
      | FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
      |s AS (
      | SELECT event_type, day, x,
      |  count(*) OVER (PARTITION BY event_type) AS n_days,
      |  CAST(sum(x) OVER (PARTITION BY event_type) AS BIGINT) AS total,
      |  CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS t,
      |  CAST(sum(x) OVER (PARTITION BY event_type ORDER BY day
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      | FROM dly),
      |pp AS (
      | SELECT *, n_days * cum - t * total AS p FROM s WHERE n_days >= 2),
      |r AS (
      | SELECT *, row_number() OVER (PARTITION BY event_type
      |  ORDER BY abs(p) DESC, day) AS rk FROM pp)
      |SELECT event_type, CAST(n_days AS BIGINT) AS n_days, day AS change_day,
      | CAST(abs(p) AS BIGINT) AS split_stat,
      | CAST((1000000 * cum) // t AS BIGINT) AS mean_before_micro,
      | CAST((1000000 * (total - cum)) // (n_days - t) AS BIGINT) AS mean_after_micro
      |FROM r WHERE rk = 1 ORDER BY event_type"""
      .stripMargin.replace('\n', ' ')

  val all: Seq[Q] = Seq(
    Q("o7_change_point", changePoint, Some(changePointSql),
      "CUSUM change-point localization per metric type: the day t* " +
        "maximizing the |mean-centered prefix sum| (argmax-CUSUM " +
        "estimator — WHEN the level shifted, o6's detection made " +
        "actionable), integer-exact ranking with no division, floor'd " +
        "micro-unit segment means; same collapse-then-window shape as o6 " +
        "(monitoring + data-QA extension)"),
    Q("o6_cusum_drift", cusumDrift, Some(cusumDriftSql),
      "CUSUM level-shift detection per metric type: Page's sequential recurrence rewritten as its maximal-suffix-sum closed form — two window passes over the collapsed daily relation, integer-exact in units of 1/n events, upward and downward detectors in one pass (monitoring + data-QA extension)"),
    Q("o5_seasonal_anomaly", seasonalAnomaly, Some(seasonalAnomalySql),
      "hour-of-day seasonal anomaly baselines: o3's Hampel rule per (metric, hour) slot - a global fence flags every evening spike and sleeps through a 3am surge; baseline relation is |types|*24 rows broadcast onto map-side rescans (monitoring extension)"),
    Q("o4_ks_drift", ksDrift, Some(ksDriftSql),
      "exact two-sample Kolmogorov–Smirnov drift per metric type on h3's snapshot slices: integer-exact CDF-gap supremum over distinct values, ONE terminal division to micro-points — binning-free drift h3's bucket L1 can miss (data-QA extension)"),
    Q("o8_ks_binned", ksBinned, Some(ksBinnedSql),
      "o4's documented scale swap executed as a gate entry: binned-ECDF " +
        "KS over h2's shared-bounds grid (bucket counts only — no " +
        "distinct-value sort), with BOTH provable error bounds pinned " +
        "as data: binned never exceeds exact, exact within one bucket's " +
        "cleared-denominator mass (data-QA extension)"),
    Q("h3_histogram_drift", histogramDrift, Some(histogramDriftSql),
      "snapshot-over-snapshot histogram drift: shared-bounds h2 buckets, per-type exact-integer L1 distance in ONE flagged scan — distribution drift caught before it crosses an o1 fence (data-QA extension)"),
    Q("h2_value_histogram", valueHistogram, Some(valueHistogramSql),
      s"per-type equal-width $HistBuckets-bucket value histogram: tiny bounds aggregate broadcast back, map-side bucket assignment in plain IEEE arithmetic (data-QA extension)"),
    Q("o1_outlier_bounds", outlierBounds, Some(outlierBoundsSql),
      "Tukey-fence outlier accounting per metric type: exact quartiles, broadcast fences, map-side conditional count (monitoring + data-QA extension)"),
    Q("o2_outlier_approx", outlierBoundsApprox, Some(outlierBoundsApproxSql),
      "o1's approx_percentile deployment form driver-executed: approx-fence outlier counts judged against the exact counts inside a rank-error band, pinned to true by the oracle (data-QA extension)"),
    Q("o3_mad_outliers", madOutliers, Some(madOutliersSql),
      "MAD robust outlier accounting per metric type (Hampel identifier, 50% breakdown point): median + median-absolute-deviation via tiny-agg-broadcast-rescan passes, map-side conditional count (data-QA extension)"),
    Q("j10_salted_join", saltedSegmentActivity, Some(saltedSegmentActivitySql),
      "skew-mitigated salted equi-join: fact salt × replicated dim, result identical to the plain join (oracle = plain join)"),
    Q("f2_json_extract", jsonExtractStats, Some(jsonExtractStatsSql),
      "typed JSON field extraction + grouped rollup over the props payload column"),
    Q("p13_percentiles", valuePercentiles, Some(valuePercentilesSql),
      "exact interpolated per-group percentiles (p50/p95 latency-quantile rollup)"),
    Q("p14_hdr_quantiles", hdrQuantiles, Some(hdrQuantilesSql),
      "log2-bucket (HdrHistogram-shape) quantile estimation: mergeable " +
        "<= 64-counter state per group, estimate oracle-recomputed " +
        "exactly, true quantile guaranteed inside the reported bucket " +
        "(one octave) — p13's sketch deployment form where exact " +
        "percentile would sort terabytes per group"),
    Q("g3_rollup", rollupSummary, Some(rollupSummarySql),
      "ROLLUP grouping sets: group/subtotal/grand-total in one aggregate pass"),
    Q("g4_cube", cubeSummary, Some(cubeSummarySql),
      "CUBE over two dimensions with grouping_id disambiguating subtotal NULLs from data NULLs: every grouping subset in ONE Expand + hash aggregate"),
    Q("g5_grouping_sets", groupingSetsSummary, Some(groupingSetsSummarySql),
      "explicit GROUPING SETS - exactly the two 1-D slices actually served in ONE scan + Expand(x2) + hash aggregate, where CUBE pays x4 Expand and discards half its output (the g4 SCALE.md advice as a first-class operator)"),
    Q("g6_local_supplier_volume", localSupplierVolume,
      Some(localSupplierVolumeSql),
      "the deep snowflake join (TPC-H Q5 shape): revenue per nation for " +
        "same-nation customer/supplier pairs, region-scoped and " +
        "date-bounded — three broadcast dimension joins (region→nation " +
        "keys carried by customer and supplier) around ONE fact-fact " +
        "shuffle on l_orderkey; same-nation lands as a join condition, " +
        "not a post-filter; exact-decimal revenue (the g1 discipline)"),
    Q("a8_pivot", eventPivot, Some(eventPivotSql),
      "explicit-value pivot to the wide per-day dashboard shape"),
    Q("j11_interval_join", intervalJoin, Some(intervalJoinSql),
      "interval OVERLAP join (sessions x error incidents): both sides " +
        "explode over fixed-width grid cells, the join is a cell " +
        "EQUI-join with the exact overlap predicate as residual, and an " +
        "ownership rule (the cell containing the overlap's start) keeps " +
        "exactly one row per pair — j9's discipline generalized to two " +
        "interval sides; exact microsecond overlap durations"),
    Q("j9_range_join", rangeJoin, Some(rangeJoinSql),
      "bucketed interval join: points-in-window counts as a grid equi-join, not a loop join (general form of views.py:793-799)"),
    Q("j12_range_join_rule", rangeJoinNaive, Some(rangeJoinSql),
      "j9 written naively (raw non-equi ON ts >= lo AND ts < hi) and " +
        "rewritten to the grid equi-join by the injected RangeJoinRewrite " +
        "optimizer rule — plan asserted loop-free in the builder, results " +
        "hash-pinned to j9's oracle"),
    Q("j6_anti_join", customersWithoutOrders, Some(customersWithoutOrdersSql),
      "anti-join, NOT-EXISTS form (apps.py:55-69)"),
    Q("j7_scalar_subquery", ordersAboveAverage, Some(ordersAboveAverageSql),
      "scalar subquery in predicate (views.py:518-520)"),
    Q("p8_like_pattern", partsNotLikePromo, Some(partsNotLikePromoSql),
      "LIKE / NOT LIKE predicates (views.py:474)"),
    Q("p10_grid_page", gridPage, Some(gridPageSql),
      "dynamic filter assembly + limit/offset pagination (views.py:839-862)"),
    Q("p11_membership", eventsOfKinds, Some(eventsOfKindsSql),
      "IN membership + grouped count (views.py:89-92)"),
    Q("p12_search_all", searchParts, Some(searchPartsSql),
      "substring search across all columns (cpu_usage_grid.html:201-214)"),
    Q("a6_string_agg", nationsPerRegion, Some(nationsPerRegionSql),
      "ordered string aggregation (views.py:966-971)"),
    Q("e2_except", viewersNotBuyers, Some(viewersNotBuyersSql),
      "set difference (apps.py:55-69)"),
    Q("e4_relational_division", relationalDivision, Some(relationalDivisionSql),
      "relational division (Codd's FOR ALL): users covering EVERY event type via the count-matching form — one distinct-pair aggregate + per-user count on the same partitioning + a broadcast 1-row divisor, beating the double-negated two-anti-join plan (SURVEY §2.7 set-family completion)"),
    Q("e3_intersect", viewersAndBuyers, Some(viewersAndBuyersSql),
      "set intersection — distinct + one-shuffle semi join (set-op family completion)"),
    Q("g1_pricing_summary", pricingSummary, Some(pricingSummarySql),
      "grouped multi-aggregate, map-side partial (SURVEY §2.4 grouped extension)"),
    Q("g2_segment_revenue", segmentRevenue, Some(segmentRevenueSql),
      "broadcast-filtered join + grouped agg + top-k (SURVEY §2.4 grouped extension)"),
    Q("j5_semi_join", customersWithUrgentOrders, Some(customersWithUrgentOrdersSql),
      "broadcast left-semi join (views.py:161-164)"),
    Q("s3_point_lookup", pointLookup42, Some(pointLookup42Sql),
      "parameterized point lookup, pushed EqualTo filter (views.py:80-81)"),
    Q("r2_distribution_ranks", distributionRanks, Some(distributionRanksSql),
      "the distribution-rank window trio (percent_rank / cume_dist / ntile) per nation: where r1 finds the top k, these place EVERY row - one window spec, one shuffle + per-partition sort; explicit (value, key) tiebreak makes ntile's row-position tiles deterministic cross-engine"),
    Q("r1_rank_per_group", topCustomersPerNation, Some(topCustomersPerNationSql),
      "dense_rank top-3 per group (SURVEY §2.5 ranking family)"),
    Q("h1_having", richNations, Some(richNationsSql),
      "grouped agg + HAVING group filter (SURVEY §2.4 grouped extension)"))
}
