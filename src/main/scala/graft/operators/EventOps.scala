package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream-shaped operators over the batch `events` table — the
  * reference's pipeline stages re-expressed relationally (SURVEY.md §2a).
  */
object EventOps {

  /** JSON metadata parse (reference: ujson parse of registry payloads,
    * NpmPackage.scala:10). `from_json` is schema-checked and codegen'd.
    */
  def jsonExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k",
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
      .orderBy("event_type")

  /** TOLERANT ingestion of malformed JSON (the dirty-feed reality every
    * ETL pipeline handles): a deterministic md5-bucket slice of the feed
    * is corrupted (truncated), `from_json` routes it to the
    * `_corrupt_record` side-channel (PERMISSIVE semantics — the canonical
    * tolerant-ingestion pattern), and the report counts accepted/rejected
    * per type plus the aggregate over surviving payloads — bad records
    * cost their scan bytes and nothing else, no job failure, no driver
    * round-trip.
    */
  def tolerantParse(s: SparkSession, d: String): DataFrame = {
    val corrupted = Tables.events(s, d).withColumn("p",
      when(substring(md5(col("event_id").cast("string")), 1, 1) === "0",
        substring(col("props"), 1, 3)).otherwise(col("props")))
    corrupted
      .withColumn("j",
        from_json(col("p"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT, _corrupt STRING"),
          Map("columnNameOfCorruptRecord" -> "_corrupt")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        // gate on p IS NOT NULL: from_json(NULL) yields a null struct with
        // a null _corrupt, which would misclassify a NULL payload as
        // parsed — the oracle's json_valid(NULL) counts it as neither
        count(when(col("j._corrupt").isNull && col("p").isNotNull, 1)).as("n_parsed"),
        count(when(col("j._corrupt").isNotNull, 1)).as("n_rejected"),
        sum(col("j").getField("k")).as("sum_k"))
      .orderBy("event_type")
  }

  /** Explode fan-out (reference: mapConcat package→versions, Main.scala:38)
    * over document tokens; post-explode row count is bounded per input
    * split by files.maxPartitionBytes.
    */
  def explodeTokens(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy("token")

  /** The reference's Broadcast→2 filtered branches→Zip dual count
    * (Main.scala:44-67) — expressed as TWO conditional aggregates in ONE
    * pass. Catalyst computes both in the same projection: strictly less
    * work than the reference's duplicated stream branches.
    */
  def dualConditionalCount(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(
        count(when(col("event_type") === "click", 1)).as("n_click"),
        count(when(col("event_type") === "error", 1)).as("n_error"),
        round(sum(when(col("event_type") === "purchase", col("value")).otherwise(0.0)), 4).as("purchase_value"))
      .orderBy("user_id")

  /** The reference's accumulated nested map pkg→version→(dep,dev)
    * (AccumulatedDependencyCount.scala) — built as a real nested
    * map<string,struct> per user, then re-flattened so the result is
    * oracle-comparable. Exercises map_from_entries + explode round-trip.
    */
  def accumulateNested(s: SparkSession, d: String): DataFrame = {
    val perKey = Tables.events(s, d)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
    val nested = perKey
      .groupBy(col("user_id"))
      .agg(map_from_entries(
        array_sort(collect_list(struct(col("event_type"), struct(col("n"), col("sum_value"))))))
        .as("by_type"))
    nested
      .select(col("user_id"), explode(col("by_type")).as(Seq("event_type", "stats")))
      .select(col("user_id"), col("event_type"),
        col("stats.n").as("n"), col("stats.sum_value").as("sum_value"))
      .orderBy("user_id", "event_type")
  }

  /** Funnel analysis: signup → purchase conversion. One grouped pass
    * computes each user's first signup / first purchase; a scalar
    * aggregate folds them into funnel counts.
    */
  def funnel(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "signup", col("ts"))).as("first_signup"),
        min(when(col("event_type") === "purchase", col("ts"))).as("first_purchase"))
      .agg(
        count(lit(1)).as("n_users"),
        count(col("first_signup")).as("n_signed"),
        count(when(col("first_purchase") > col("first_signup"), 1)).as("n_converted"))

  /** FULL OUTER join: per-user purchase totals vs click counts — users
    * appearing on either side survive with nulls on the other (the join
    * shape `left`/`semi`/`anti`/`inner` queries don't cover). Both sides
    * are pre-aggregated so the join keys are unique (one shuffle each,
    * then a 1:1 merge).
    */
  def fullOuter(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(round(sum(col("value")), 4).as("purchase_value"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_clicks"))
    purchases.join(clicks, Seq("user_id"), "full_outer")
      .select(col("user_id"), col("purchase_value"), col("n_clicks"))
      .orderBy("user_id")
  }

  /** Cohort retention: users grouped by first-seen day (cohort), counted
    * on each later active day as a day-offset matrix. The distinct
    * (user, day) exchange feeds both the cohort min-agg and the activity
    * join (ReusedExchange); the cohort side is user-dimension-sized, so
    * the join broadcasts at small SF and shuffles on user_id at scale.
    */
  def retention(s: SparkSession, d: String): DataFrame = {
    val active = Tables.events(s, d)
      .select(col("user_id"), col("ts").cast("date").as("day"))
      .distinct()
    val cohorts = active.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
    active.join(cohorts, "user_id")
      .groupBy(col("cohort"),
        datediff(col("day"), col("cohort")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort", "day_offset")
  }

  /** Gap-based sessionization (30 min): lag + running sum of session
    * starts. Two window passes over the same (user_id, ts) sort — Spark
    * reuses the exchange+sort.
    */
  def sessionize(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull ||
          col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1).otherwise(0))
      .withColumn("session_id", sum(col("is_new")).over(running))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
      .orderBy("user_id", "session_id")
  }
}
