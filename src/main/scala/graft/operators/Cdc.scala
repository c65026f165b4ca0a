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
    * '2' → delete, '3' → insert under key+100000000), then ONE full-outer
    * join on the key with row-wise resolution:
    * matched D → drop; matched U → updated payload; unmatched I → new
    * row; otherwise the base row. Equivalent to Delta/Iceberg MERGE,
    * expressed with vanilla Catalyst operators — the whole apply is one
    * shuffle on `o_orderkey` and stays whole-stage-codegen.
    */
  def mergeUpsert(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
    val b = bucket(col("o_orderkey"))
    val changes =
      base.filter(b.isin("0", "1"))
        .select(col("o_orderkey").as("k"), lit("U").as("op"),
          col("o_custkey").as("c_ck"), (col("o_totalprice") + 100.0).as("c_price"))
      .unionByName(base.filter(b === "2")
        .select(col("o_orderkey").as("k"), lit("D").as("op"),
          col("o_custkey").as("c_ck"), col("o_totalprice").as("c_price")))
      .unionByName(base.filter(b === "3")
        .select((col("o_orderkey") + 100000000L).as("k"), lit("I").as("op"),
          col("o_custkey").as("c_ck"), (col("o_totalprice") + 0.5).as("c_price")))
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
    * text-revised, '2' cloned under doc_id+1000000). The diff is one
    * full-outer join on doc_id comparing md5(text) — content hashes are
    * computed BEFORE the join so full texts never shuffle twice, and the
    * unchanged majority is filtered post-join (at 100 TB the join input
    * can be pre-pruned to docs whose (id, hash) pair is absent from the
    * other side via the same hashes).
    */
  def snapshotDiff(s: SparkSession, d: String): DataFrame = {
    val a = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), md5(col("text")).as("h_a"))
    val bkt = bucket(col("doc_id"))
    val docs = Tables.documents(s, d)
    val bSnap = docs.filter(bkt =!= "0")
      .select(col("doc_id"),
        when(bkt === "1", concat(col("text"), lit(" rev2")))
          .otherwise(col("text")).as("text"))
      .unionByName(docs.filter(bkt === "2")
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
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
