package graft.schema

import java.time.LocalDateTime

/** Typed row shapes for the testdata tables (SURVEY §1.1: the engine
  * exposes BOTH surfaces — DataFrame for dynamic schemas, Dataset[T] with
  * case-class Encoders where compile-time field safety helps). Timestamps
  * are LocalDateTime: the NTZ encoding every table uses (TESTDATA.md).
  */
case class Lineitem(
    l_orderkey: Long, l_partkey: Long, l_suppkey: Long, l_linenumber: Int,
    l_quantity: Double, l_extendedprice: Double, l_discount: Double,
    l_tax: Double, l_returnflag: String, l_linestatus: String,
    l_shipdate: LocalDateTime)

case class Order(
    o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
    o_totalprice: Double, o_orderdate: LocalDateTime, o_orderpriority: String)

case class Customer(
    c_custkey: Long, c_name: String, c_nationkey: Int,
    c_acctbal: Double, c_mktsegment: String)

case class Event(
    event_id: Long, ts: LocalDateTime, user_id: Long,
    event_type: String, value: Double, props: String)

case class Document(
    doc_id: Long, text: String, lang: String, source: String, n_chars: Long)

case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)
