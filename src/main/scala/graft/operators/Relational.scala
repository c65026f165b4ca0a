package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operator family (SURVEY.md §2b).
  *
  * Every query is a declarative DataFrame builder so Catalyst owns the
  * physical plan: partial aggregation map-side, broadcast for every
  * dimension table, filters/projections pushed to the parquet scan, AQE
  * for runtime coalescing + skew handling. All numeric outputs rounded to
  * 4dp and totally ordered so the driver's DuckDB hash-compare is
  * deterministic.
  */
object Relational {

  /** Timestamp literal cast to the column's actual type (parquet nanos
    * without tz reads as TIMESTAMP_NTZ in Spark 4; ms-with-tz as LTZ —
    * this keeps literal comparisons cast-safe either way).
    */
  private def tsLit(df: DataFrame, c: String, v: String) =
    lit(v).cast(df.schema(c).dataType)

  import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

  /** Quantize a 4dp-grid value to a BIGINT on the 1e-4 grid. TPC-H
    * measures have ≤2 decimal digits, so this is lossless.
    */
  private def qz(c: Column): Column = round(c * lit(10000)).cast(LongType)

  /** Exact sum of a quantized (integer) expression: accumulate as
    * DECIMAL(38,0) (no long overflow, no float order-dependence), then
    * one cast to double. Any engine computing the same integer moments
    * gets the bit-identical double — the q16 lesson (VERDICT r1 §wrong 1)
    * applied to every large-sum aggregate. `scale` is the grid the
    * quantized products live on (1e4 per quantized factor).
    */
  private def qsum(c: Column, scale: Double): Column =
    sum(c.cast(DecimalType(38, 0))).cast(DoubleType) / lit(scale)

  /** TPC-H Q1-shaped pricing summary: grouped aggregation with map-side
    * partial agg; at 100 TB this is one shuffle of ~6 tiny grouped rows
    * per map task. (Reference analog: tagged conditional counting,
    * Main.scala:44-67, generalized.)
    */
  def aggPricing(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    // Quantized-exact sums (see qsum): the built-in double sum diverges
    // from DuckDB's at ~1e-15 over multi-million-row groups and lands on
    // the wrong side of the round(,4) boundary at sf1+.
    val q = qz(col("l_quantity")); val p = qz(col("l_extendedprice"))
    val disc1 = lit(10000L) - qz(col("l_discount"))   // (1-disc) on the grid
    val tax1  = lit(10000L) + qz(col("l_tax"))        // (1+tax) on the grid
    li.filter(col("l_shipdate") <= tsLit(li, "l_shipdate", "1999-01-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).cast(DoubleType).as("n"),
        qsum(q, 1e4).as("sq"),
        qsum(p, 1e4).as("sp"),
        qsum(p * disc1, 1e8).as("sdp"),
        qsum(p * disc1 * tax1, 1e12).as("sch"),
        qsum(qz(col("l_discount")), 1e4).as("sd"),
        count(lit(1)).as("count_order"))
      .select(
        col("l_returnflag"), col("l_linestatus"),
        round(col("sq"), 4).as("sum_qty"),
        round(col("sp"), 4).as("sum_base_price"),
        round(col("sdp"), 4).as("sum_disc_price"),
        round(col("sch"), 4).as("sum_charge"),
        round(col("sq") / col("n"), 4).as("avg_qty"),
        round(col("sp") / col("n"), 4).as("avg_price"),
        round(col("sd") / col("n"), 4).as("avg_disc"),
        col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** TPC-H Q6-shaped selective scan: predicate + projection pushed to the
    * parquet reader (verified in PlanSpec) — reads 4 columns, not 11.
    */
  def filterPushdown(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    li.filter(
        col("l_shipdate") >= tsLit(li, "l_shipdate", "1996-01-01") &&
        col("l_shipdate") <  tsLit(li, "l_shipdate", "1998-01-01") &&
        col("l_discount").between(0.03, 0.07) &&
        col("l_quantity") < 24)
      .agg(round(qsum(qz(col("l_extendedprice")) * qz(col("l_discount")), 1e8), 4)
        .as("revenue"))
  }

  /** Fact ⋈ broadcast(dim): customer is broadcast, orders never shuffles. */
  def broadcastJoin(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(qsum(qz(col("o_totalprice")), 1e4), 4).as("total"))
      .orderBy("c_mktsegment")

  /** TPC-H Q5-shaped 5-table star join: true dimensions broadcast; the
    * lineitem ⋈ orders leg is fact-to-fact, so NO hint there — orders is
    * corpus-sized and a forced broadcast is an executor OOM at 100 TB
    * (AQE still broadcasts it at test SFs where it measures in MBs; at
    * scale it becomes a shuffle join on l_orderkey, the co-location key
    * a bucketed layout would pre-partition — Layouts.bucketize).
    */
  def multiJoin(s: SparkSession, d: String): DataFrame = {
    val dims = broadcast(
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA"))
    // Dims join FIRST: the broadcast filter cuts orders to the ASIA fifth
    // before the fact⋈fact join, so the big join builds on 30 M orders
    // instead of 150 M and constructs 120 M output rows instead of 600 M.
    // With AQE's SMJ→shuffled-hash conversion (GraftSession) the 600 M
    // lineitem side is then never sorted — together 118.7 → 23.5 s
    // steady-state at the 1000× point (SCALE.md round-3 table).
    // (A per-order pre-aggregation was measured here and REJECTED: a
    // partial agg keyed by a near-unique key builds partition-sized hash
    // maps that spill to sort-based fallback — ~3.5× slower at 1000×; the
    // TopKPerKey adaptive-skip lesson in aggregate form.)
    val ordAsia = Tables.orders(s, d).select("o_orderkey", "o_custkey")
      .join(dims, col("o_custkey") === col("c_custkey"))
    Tables.lineitem(s, d)
      .join(ordAsia, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"))
      .agg(round(qsum(
        qz(col("l_extendedprice")) * (lit(10000L) - qz(col("l_discount"))), 1e8), 4)
        .as("revenue"))
      .orderBy("n_name")
  }

  /** Top-k: Catalyst plans TakeOrderedAndProject — no global sort at scale. */
  def topK(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), round(col("o_totalprice"), 4).as("totalprice"))
      .orderBy(col("totalprice").desc, col("o_orderkey"))
      .limit(10)

  /** Distinct aggregation (partial-agg distinct, single row). */
  def distinctAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        countDistinct(col("o_orderpriority")).as("n_prio"),
        count(lit(1)).as("n_orders"))

  /** Window rank: top-3 orders per customer (deterministic tie-break). */
  def windowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rnk", rank().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rnk"),
        round(col("o_totalprice"), 4).as("totalprice"))
      .orderBy("o_custkey", "rnk", "o_orderkey")
  }

  /** Same result as [[windowRank]] but through the library's custom
    * whole-operator (`graft.plans.TopKPerKey`): LogicalPlan node →
    * Strategy → bounded-heap physical exec. One hash shuffle, NO
    * per-partition sort — the plan a window function can't give you.
    */
  def topKPerKeyCustom(s: SparkSession, d: String): DataFrame =
    graft.plans.TopK.perKey(
      Tables.orders(s, d),
      keyCols = Seq("o_custkey"),
      sortCols = Seq(("o_totalprice", false), ("o_orderkey", true)),
      k = 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rnk"),
        round(col("o_totalprice"), 4).as("totalprice"))
      .orderBy("o_custkey", "rnk", "o_orderkey")

  /** Anti join: customers with no high-value order (Catalyst plans
    * BroadcastHashJoin LeftAnti over the filtered key set).
    */
  def semiAntiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 300000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")

  /** Union + exact distinct. */
  def unionDedup(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(col("o_custkey").as("k"))
      .unionByName(Tables.customer(s, d).select(col("c_custkey").as("k")))
      .distinct()
      .orderBy("k")

  /** Set operations: INTERSECT / EXCEPT between key sets (customers
    * with any order vs customers with a high-value order).
    */
  def setOps(s: SparkSession, d: String): DataFrame = {
    val anyOrder = Tables.orders(s, d).select(col("o_custkey").as("k"))
    val bigOrder = Tables.orders(s, d).filter(col("o_totalprice") > 300000)
      .select(col("o_custkey").as("k"))
    anyOrder.intersect(bigOrder.select(col("k")))
      .withColumn("tag", lit("both"))
      .unionByName(anyOrder.except(bigOrder).withColumn("tag", lit("small_only")))
      .orderBy("tag", "k")
  }

  /** Deterministic stratified sampling (seeded): the 100 TB way to build
    * eval slices per stratum without a global shuffle. Sampling algorithm
    * is engine-specific → property-tested, not oracled.
    */
  def stratifiedSample(s: SparkSession, d: String,
                       fractions: Map[String, Double] = Map(
                         "click" -> 0.5, "purchase" -> 0.1, "error" -> 0.0,
                         "view" -> 0.25, "signup" -> 1.0),
                       seed: Long = 42L): DataFrame =
    Tables.events(s, d).stat.sampleBy("event_type", fractions, seed)

  /** ROLLUP hierarchical aggregation (GROUPING SETS). */
  def rollupAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .rollup(col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        round(qsum(qz(col("o_totalprice")), 1e4), 4).as("total"))
      .orderBy(asc_nulls_first("c_mktsegment"), asc_nulls_first("o_orderpriority"))

  /** CUBE: all grouping-set combinations. */
  def cubeAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .cube(col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("c_mktsegment"), asc_nulls_first("o_orderpriority"))

  /** Sketch aggregates for 100 TB: HLL distinct + approximate quantiles —
    * single pass, bounded memory, mergeable partials. Accuracy bounds are
    * property-tested (no cross-engine oracle: sketch internals differ).
    */
  def approxAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .agg(
        approx_count_distinct(col("o_custkey")).as("acd_cust"),
        approx_percentile(col("o_totalprice"), lit(0.5), lit(10000)).as("ap50"))

  /** Correlated scalar subquery, decorrelated as a window aggregate:
    * customers above their segment's average balance. One pass, no join.
    */
  def correlatedSubq(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
    Tables.customer(s, d)
      .withColumn("seg_avg", avg(col("c_acctbal")).over(w))
      .filter(col("c_acctbal") > col("seg_avg"))
      .select(col("c_custkey"), round(col("c_acctbal"), 4).as("acctbal"))
      .orderBy("c_custkey")
  }

  /** Scalar subquery: rows above the GLOBAL average — the single-value
    * subquery becomes a one-row broadcast (Catalyst subquery execution),
    * never a per-row rescan.
    */
  def scalarSubq(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    o.createOrReplaceTempView("graft_orders_ssq")
    s.sql(
      """SELECT o_orderkey, round(o_totalprice, 4) AS totalprice
        |FROM graft_orders_ssq
        |WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM graft_orders_ssq)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** Correlated EXISTS: customers with at least one urgent order —
    * planned as a left-semi hash join (one shuffle, no subquery rescan).
    */
  def existsSubq(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("graft_cust_esq")
    Tables.orders(s, d).createOrReplaceTempView("graft_orders_esq")
    s.sql(
      """SELECT c_custkey, c_mktsegment
        |FROM graft_cust_esq c
        |WHERE EXISTS (SELECT 1 FROM graft_orders_esq o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Window-function suite beyond rank: ntile, percent_rank, cume_dist,
    * first/last value over one (partition, order) — ONE exchange+sort
    * serves all five functions.
    */
  def windowSuite(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    val wRange = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.customer(s, d)
      .select(col("c_mktsegment"), col("c_custkey"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 4).as("pct_rank"),
        round(cume_dist().over(w), 4).as("cume"),
        first(col("c_custkey")).over(wRange).as("poorest"),
        last(col("c_custkey")).over(wRange).as("richest"))
      .orderBy("c_mktsegment", "c_custkey")
  }

  /** HAVING: post-aggregation filter. */
  def havingAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 4).as("total"))
      .filter(col("n") >= 5)
      .orderBy("o_custkey")

  /** Exact interpolated percentiles per group (Spark `percentile` ≡
    * DuckDB `quantile_cont`). At 100 TB switch to approx_percentile —
    * bounded memory, one pass — this operator is the exact baseline.
    */
  def percentiles(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(percentile(col("l_extendedprice"), lit(0.5)), 4).as("p50"),
        round(percentile(col("l_extendedprice"), lit(0.9)), 4).as("p90"))
      .orderBy("l_returnflag")

  /** Statistical aggregates: stddev / correlation / covariance.
    *
    * Built-in `stddev_samp`/`corr`/`covar_samp` accumulate doubles in
    * partition-order-dependent ways, so two engines can land on opposite
    * sides of a 4dp rounding boundary. Instead each value is quantized to
    * a 1e-4-grid BIGINT per row (products stay < 2^63: max price 1.05e5 →
    * 1.05e9 quantized → square 1.1e18), the raw moments (n, Σx, Σx², Σxy)
    * are summed EXACTLY as DECIMAL(38,0), and sd/corr/cov are derived
    * from those moments with one fixed double expression. The moments are
    * order-independent, so any engine computing them gets bit-identical
    * results — and the shuffle still carries only 9 numbers per group.
    */
  def statsAgg(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
    def qz(c: Column): Column = round(c * lit(10000)).cast(LongType)
    def dsum(c: Column): Column =
      sum(c.cast(DecimalType(38, 0))).cast(DoubleType)
    val q = qz(col("l_quantity")); val p = qz(col("l_extendedprice"))
    val dd = qz(col("l_discount")); val t = qz(col("l_tax"))
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).cast(DoubleType).as("n"),
        dsum(q).as("sq"), dsum(q * q).as("sqq"),
        dsum(p).as("sp"), dsum(p * p).as("spp"), dsum(q * p).as("sqp"),
        dsum(dd).as("sd"), dsum(t).as("st"), dsum(dd * t).as("sdt"))
      .select(
        col("l_returnflag"),
        round(sqrt((col("sqq") - col("sq") * col("sq") / col("n")) /
          (col("n") - 1)) / 10000, 4).as("sd_qty"),
        // `+ 0.0` collapses IEEE -0.0 to +0.0 (DuckDB keeps the sign
        // through round(); BigDecimal-backed Spark round() does not).
        (round((col("n") * col("sqp") - col("sq") * col("sp")) /
          (sqrt(col("n") * col("sqq") - col("sq") * col("sq")) *
            sqrt(col("n") * col("spp") - col("sp") * col("sp"))), 4) + 0.0)
          .as("corr_qp"),
        (round((col("sdt") - col("sd") * col("st") / col("n")) /
          (col("n") - 1) / 100000000.0, 4) + 0.0).as("cov_dt"))
      .orderBy("l_returnflag")
  }

  /** Value-based RANGE window: 7-DAY trailing average over daily revenue,
    * framed on the DATE VALUE (epoch days), not on row positions — the
    * correct trailing-interval semantics when days can be missing (a
    * rows(-6, 0) frame silently stretches across gaps; a RANGE frame
    * covers exactly the last 7 calendar days). Same tiny post-agg window
    * shape as q17.
    */
  def rangeWindow(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.lineitem(s, d)
      .groupBy(to_date(col("l_shipdate")).as("d"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      .withColumn("ed", unix_date(col("d")))
      // 1e-4-grid quantization so the windowed mean sums BIGINTs exactly
      // (a double avg's accumulation order diverges across engines in
      // the 4th rounded decimal — the q16 lesson applied to windows)
      .withColumn("qrev", round(col("rev") * 10000).cast("long"))
    val w = Window.orderBy(col("ed")).rangeBetween(-6, Window.currentRow)
    // round at INTEGER scale (quantized-sum / count), then shift the
    // decimal: a 4dp round of the double quotient lands on shortest-
    // decimal-representation boundaries differently per engine, while
    // the quotient is ≥ 1/(2·count) ≈ 2e-4 away from any half-integer
    // (or exactly on it, where both engines round up) — so the integer
    // round is engine-exact.
    daily
      .select(col("d"), round(col("rev"), 4).as("revenue"),
        (round(sum(col("qrev")).over(w) / count(lit(1)).over(w)) / 10000.0)
          .as("trail7"))
      .orderBy("d")
  }

  /** Approximate distinct counting — the 100 TB path for cardinality:
    * HyperLogLog++ sketches aggregate map-side into a fixed-size buffer
    * (vs countDistinct's expand + exact shuffle of every distinct value).
    * Relative error defaults to ~2.3 % (rsd 0.023); the spec pins the
    * observed error against the exact counts. Sketch values are
    * engine-specific → rows-only for the driver oracle.
    */
  def approxDistinct(s: SparkSession, d: String, rsd: Double = 0.023): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        approx_count_distinct(col("o_custkey"), rsd).as("approx_cust"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  /** q65's oracle bridge: the HLL++ estimate itself is engine-specific,
    * but its contracted ACCURACY is not — emit the exact per-group
    * cardinality alongside an integer bound check
    * |approx − exact| · 10 ≤ exact (10 % ≈ 4.3·rsd; observed ≤ ~2 %).
    * DuckDB reproduces the exact side and the constant-true flag, so
    * the driver hash-checks that every group's estimate lands in bound
    * — the q61b pattern applied to sketch cardinality.
    */
  def approxDistinctBridge(s: SparkSession, d: String, rsd: Double = 0.023): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("exact_cust"),
        approx_count_distinct(col("o_custkey"), rsd).as("approx"))
      .select(col("o_orderpriority"), col("exact_cust"),
        (abs(col("approx") - col("exact_cust")) * 10 <= col("exact_cust"))
          .cast("long").as("within_10pct"))
      .orderBy("o_orderpriority")

  /** Time-series: daily revenue with a 7-row moving average. The single
    * unpartitioned window is fine for ~2.5k daily rows even at 100 TB
    * (the daily aggregate is tiny); the heavy lifting is the grouped agg.
    */
  def movingAvg(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.lineitem(s, d)
      .groupBy(to_date(col("l_shipdate")).as("d"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
    val w = Window.orderBy(col("d")).rowsBetween(-6, Window.currentRow)
    daily
      .select(col("d"), round(col("rev"), 4).as("revenue"),
        round(avg(col("rev")).over(w), 4).as("ma7"))
      .orderBy("d")
  }

  /** As-of join: latest order date at or before each event's timestamp
    * for the same key — expressed as a range join + max aggregate, which
    * shuffles each side once by the equi-key. (At 100 TB: sort within
    * key partitions + merge, or a broadcast calendar of per-key order
    * dates.)
    */
  def asofJoin(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).select(col("event_id"), col("user_id"), col("ts"))
    val o = Tables.orders(s, d).select(col("o_custkey"), col("o_orderdate"))
    e.join(o, col("user_id") === col("o_custkey") && col("o_orderdate") <= col("ts"), "left")
      .groupBy(col("event_id"))
      .agg(max(col("o_orderdate")).as("asof_orderdate"))
      .orderBy("event_id")
  }

  /** Range join: clicks by the same user in the hour before each
    * purchase (equi-key + time-interval predicate).
    */
  def rangeJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    p.join(c,
        col("c_user") === col("p_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") < col("p_ts"), "left")
      .groupBy(col("p_id"))
      .agg(count(col("c_ts")).as("n_clicks"))
      .select(col("p_id").as("event_id"), col("n_clicks"))
      .orderBy("event_id")
  }

  /** Pivot: per-user event-type matrix (fixed pivot values → single pass,
    * no extra job to discover values).
    */
  def pivotEvents(s: SparkSession, d: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val p = Tables.events(s, d)
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .count()
    p.select(col("user_id") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      .orderBy("user_id")
  }
}
