package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Change-data-capture operators: MERGE-style upsert application and
  * snapshot diffing. Both are single co-partitioned shuffle joins on the
  * record key — the canonical CDC-apply plan shape at 100 TB (no driver
  * involvement, no global sort; AQE handles key skew). The change feeds
  * are derived deterministically from the base tables via md5-hex
  * bucketing so both engines construct bit-identical inputs.
  */
object Cdc {

  private def bucket(c: org.apache.spark.sql.Column) =
    substring(md5(c.cast("string")), 1, 1)

  /** MERGE INTO semantics (upsert + delete) applied declaratively:
    * deterministic change feed (buckets '0'/'1' → update price+100,
    * '2' → delete, '3' → insert above the live keyspace), then ONE full-outer
    * join on the key with row-wise resolution:
    * matched D → drop; matched U → updated payload; unmatched I → new
    * row; otherwise the base row. Equivalent to Delta/Iceberg MERGE,
    * expressed with vanilla Catalyst operators — the whole apply is one
    * shuffle on `o_orderkey` and stays whole-stage-codegen.
    */
  /** The deterministic change feed shared by the batch MERGE (q87) and
    * the streaming apply (q92): one op per key, buckets disjoint. The
    * insert keys live at `o_orderkey + max(o_orderkey) + 1` — derived
    * from the ACTUAL keyspace (a 1-row column-pruned aggregate,
    * AQE-broadcast), not a fixed constant that a large-SF keyspace
    * would grow past and collide with.
    */
  private[graft] def changeFeed(base: DataFrame): DataFrame = {
    val b = bucket(col("o_orderkey"))
    val off = base.agg((max(col("o_orderkey")) + 1L).as("koff"))
    base.filter(b.isin("0", "1"))
      .select(col("o_orderkey").as("k"), lit("U").as("op"),
        col("o_custkey").as("c_ck"), (col("o_totalprice") + 100.0).as("c_price"))
    .unionByName(base.filter(b === "2")
      .select(col("o_orderkey").as("k"), lit("D").as("op"),
        col("o_custkey").as("c_ck"), col("o_totalprice").as("c_price")))
    .unionByName(base.filter(b === "3").crossJoin(off)
      .select((col("o_orderkey") + col("koff")).as("k"), lit("I").as("op"),
        col("o_custkey").as("c_ck"), (col("o_totalprice") + 0.5).as("c_price")))
  }

  /** Catalog name of the maintained bucketed ORDERS base for (dir, key).
    * One table per join key a maintained pipeline actually uses — the
    * MERGE path keys on `o_orderkey`, the incremental-agg path on
    * `o_custkey`; bucket layout is per-key by nature.
    */
  private[graft] def bucketedOrdersTbl(d: String, key: String): String =
    s"graft_cdcbase_${key}_${graft.DirKeys.generation(d, "orders.parquet")}"

  /** Bucket count sized to the TABLE, not a constant: ~256 MB of source
    * parquet per bucket (floor 32, cap 4096). A bucketed side removes
    * its exchange but also PINS the join's partition count to the bucket
    * count — no AQE re-split is possible on an exchange-free side. The
    * 10 000× run found the failure mode: 32 buckets over 1.5 B orders
    * forced the feed side's co-partitioned hash maps into 32 partitions
    * of ~15 M rows each and OOM'd the shuffled-hash build. Sizing
    * buckets by volume keeps per-bucket scans block-sized and the
    * opposite side's per-partition state bounded at any SF.
    */
  private def ordersBuckets(s: SparkSession, d: String): Int = {
    val p = new org.apache.hadoop.fs.Path(s"$d/orders.parquet")
    val bytes =
      try p.getFileSystem(s.sparkContext.hadoopConfiguration)
        .getContentSummary(p).getLength
      catch { case _: Exception => 0L }
    math.max(32, math.min(4096, math.ceil(bytes / (256L << 20).toDouble).toInt))
  }

  /** The orders base as a MAINTAINED bucketed table (built once per
    * catalog — offline layout work, the [[LshIndex.buildIndex]] stance):
    * reads are hash-partitioned by `key` at the scan, so the CDC apply's
    * full-outer join (q87) and the incremental agg's groupBy (q93) plan
    * ZERO exchange on the base side. This is [[Layouts.writeBucketed]]
    * applied to the engine's own heaviest measured shapes (the 7.3×/7.8×
    * full-table-shuffle steps at the 10 000× point).
    */
  private[graft] def bucketedOrders(s: SparkSession, d: String, key: String): DataFrame = {
    val t = bucketedOrdersTbl(d, key)
    if (!s.catalog.tableExists(t)) {
      graft.WarehouseGC.sweep(s, d) // superseded generations die at build time
      // clear a stale warehouse dir from a previous JVM (in-memory
      // catalog forgets managed tables on exit; saveAsTable would fail
      // on the leftover non-empty location)
      val wh = java.net.URI.create(s.conf.get("spark.sql.warehouse.dir")).getPath
      val loc = java.nio.file.Paths.get(wh, t)
      if (java.nio.file.Files.exists(loc)) {
        val walk = java.nio.file.Files.walk(loc)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
        finally walk.close()
      }
      Layouts.writeBucketed(Tables.orders(s, d), t, key, ordersBuckets(s, d))
    }
    s.table(t)
  }

  def mergeUpsert(s: SparkSession, d: String): DataFrame =
    mergeUpsertPlan(Tables.orders(s, d))

  /** q87 with the base read from the maintained bucketed table: same
    * plan, same oracle, but the base side of the full-outer MERGE join
    * arrives pre-partitioned (no exchange) — only the delta-sized feed
    * shuffles. The production form of MERGE upkeep at 100 TB.
    */
  def mergeUpsertBucketed(s: SparkSession, d: String): DataFrame =
    mergeUpsertPlan(bucketedOrders(s, d, "o_orderkey"))

  private def mergeUpsertPlan(base: DataFrame): DataFrame = {
    val changes = changeFeed(base)
    base.join(changes, col("o_orderkey") === col("k"), "full_outer")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(
        coalesce(col("o_orderkey"), col("k")).as("o_orderkey"),
        coalesce(col("c_ck"), col("o_custkey")).as("o_custkey"),
        when(col("op").isin("U", "I"), col("c_price"))
          .otherwise(col("o_totalprice")).as("o_totalprice"),
        when(col("op") === "I", lit("insert"))
          .when(col("op") === "U", lit("update"))
          .otherwise(lit("base")).as("applied"))
      .orderBy("o_orderkey")
  }

  /** Snapshot diff (CDC bootstrap): compare two corpus snapshots by
    * content hash and emit `added` / `removed` / `changed` per document.
    * Snapshot B is derived deterministically (bucket '0' removed, '1'
    * text-revised, '2' cloned above the live doc_id keyspace). The diff is one
    * full-outer join on doc_id comparing md5(text) — content hashes are
    * computed BEFORE the join so full texts never shuffle twice, and the
    * unchanged majority is filtered post-join (at 100 TB the join input
    * can be pre-pruned to docs whose (id, hash) pair is absent from the
    * other side via the same hashes).
    */
  /** Incremental aggregate maintenance (materialized-view upkeep): a
    * stored per-customer aggregate (simulated here as the bucket≠'f'
    * slice) is brought up to date by merging the DELTA batch's partial
    * aggregate — one full-outer join of two agg tables, never a rescan
    * of the base facts. Works because the sums are associative integer
    * partials (the q01 quantized-DECIMAL recipe), so base ⊕ delta is
    * bit-identical to a full recompute — which is exactly what the
    * oracle runs. At 100 TB this is the nightly-ETL shape: the base agg
    * is a stored table and only delta-sized work happens per batch.
    */
  def incrementalAgg(s: SparkSession, d: String): DataFrame =
    incrementalAggPlan(Tables.orders(s, d))

  /** q93 with the facts read from the o_custkey-bucketed base: both the
    * base-slice and delta-slice partial aggregates AND their full-outer
    * merge join inherit the scan's hash partitioning — the whole
    * maintenance pass plans with ZERO exchanges (plan-asserted).
    */
  def incrementalAggBucketed(s: SparkSession, d: String): DataFrame =
    incrementalAggPlan(bucketedOrders(s, d, "o_custkey"))

  private def incrementalAggPlan(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
    def part(df: DataFrame): DataFrame = df.groupBy(col("o_custkey")).agg(
      count(lit(1)).as("n"),
      sum(round(col("o_totalprice") * 1e4).cast(LongType)
        .cast(DecimalType(38, 0))).as("rev_q"))
    val b = bucket(col("o_orderkey"))
    val base = part(orders.filter(b =!= "f"))
      .withColumnsRenamed(Map("n" -> "n_b", "rev_q" -> "rev_b"))
    val delta = part(orders.filter(b === "f"))
      .withColumnsRenamed(Map("n" -> "n_d", "rev_q" -> "rev_d", "o_custkey" -> "k"))
    base.join(delta, col("o_custkey") === col("k"), "full_outer")
      .select(
        coalesce(col("o_custkey"), col("k")).as("o_custkey"),
        (coalesce(col("n_b"), lit(0L)) + coalesce(col("n_d"), lit(0L))).as("n_orders"),
        ((coalesce(col("rev_b"), lit(0).cast(DecimalType(38, 0)))
          + coalesce(col("rev_d"), lit(0).cast(DecimalType(38, 0))))
          .cast(DoubleType) / 1e4).as("revenue"))
      .orderBy("o_custkey")
  }

  def snapshotDiff(s: SparkSession, d: String): DataFrame = {
    val a = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), md5(col("text")).as("h_a"))
    val bkt = bucket(col("doc_id"))
    val docs = Tables.documents(s, d)
    // clone ids sit above the actual keyspace (collision-free at any SF)
    val off = docs.agg((max(col("doc_id")) + 1L).as("doff"))
    val bSnap = docs.filter(bkt =!= "0")
      .select(col("doc_id"),
        when(bkt === "1", concat(col("text"), lit(" rev2")))
          .otherwise(col("text")).as("text"))
      .unionByName(docs.filter(bkt === "2").crossJoin(off)
        .select((col("doc_id") + col("doff")).as("doc_id"), col("text")))
    val b2 = bSnap.select(col("doc_id").as("b_id"), md5(col("text")).as("h_b"))
    a.join(b2, col("doc_id") === col("b_id"), "full_outer")
      .select(
        coalesce(col("doc_id"), col("b_id")).as("doc_id"),
        when(col("b_id").isNull, lit("removed"))
          .when(col("doc_id").isNull, lit("added"))
          .when(col("h_a") =!= col("h_b"), lit("changed")).as("change"))
      .filter(col("change").isNotNull)
      .orderBy("doc_id")
  }
}
