package graft

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** Typed table model: case-class `Dataset[T]` views where compile-time
  * field checks help (pipeline code touching many columns), with
  * `DataFrame` kept for the dynamic-schema operators.
  */
object Model {
  case class Lineitem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
      l_linenumber: Int, l_quantity: Double, l_extendedprice: Double,
      l_discount: Double, l_tax: Double, l_returnflag: String,
      l_linestatus: String, l_shipdate: java.time.LocalDateTime)
  case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderdate: java.time.LocalDateTime,
      o_orderpriority: String)
  case class Customer(c_custkey: Long, c_name: String, c_nationkey: Int,
      c_acctbal: Double, c_mktsegment: String)
  case class Doc(doc_id: Long, text: String, lang: String, source: String,
      n_chars: Long)

  def lineitems(s: SparkSession, d: String): Dataset[Lineitem] = {
    import s.implicits._
    Tables.lineitem(s, d).as[Lineitem]
  }
  def orders(s: SparkSession, d: String): Dataset[Order] = {
    import s.implicits._
    Tables.orders(s, d).as[Order]
  }
  def docs(s: SparkSession, d: String): Dataset[Doc] = {
    import s.implicits._
    Tables.documents(s, d).as[Doc]
  }

  /** Custom typed aggregation (`Aggregator[IN, BUF, OUT]`): discounted
    * revenue — merge-able buffer, usable as a TypedColumn in
    * `groupByKey(...).agg(...)`.
    */
  val revenue: Aggregator[Lineitem, Double, Double] =
    new Aggregator[Lineitem, Double, Double] {
      override def zero: Double = 0.0
      override def reduce(b: Double, l: Lineitem): Double =
        b + l.l_extendedprice * (1 - l.l_discount)
      override def merge(a: Double, b: Double): Double = a + b
      override def finish(r: Double): Double = r
      override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
}
