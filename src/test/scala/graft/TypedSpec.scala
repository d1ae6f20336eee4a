package graft

import graft.schema.{Event, Lineitem}

class TypedSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("typed Dataset surface: encoders round-trip every table") {
    assert(Tables.typed.lineitem(spark, dir).head().isInstanceOf[Lineitem])
    assert(Tables.typed.orders(spark, dir).count() == 1500)
    assert(Tables.typed.customer(spark, dir).count() == 150)
    assert(Tables.typed.documents(spark, dir).count() == 500)
    assert(Tables.typed.embeddings(spark, dir).head().embedding.length == 64)
  }

  test("typed transformations: compile-time fields, same lazy plans") {
    import SparkSpec.session.implicits._
    val ev: Event = Tables.typed.events(spark, dir)
      .filter((e: Event) => e.event_type == "click")
      .head()
    assert(ev.event_type == "click")
    // typed map keeps the Dataset surface
    val qty = Tables.typed.lineitem(spark, dir)
      .map((l: Lineitem) => l.l_quantity)
      .head()
    assert(qty > 0)
  }
}
