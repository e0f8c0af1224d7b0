package graft

import java.sql.Timestamp

import graft.ops.PitJoin

/** B54 — SCD2 point-in-time join: crafted version-flip fixture with
  * hand-computed attribution, plus the two structural invariants on the
  * real tables — fan-out exactly 1 (every lineitem matches exactly one
  * version) and a full driver-side last-order-wins replay.
  */
class PitJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("B54: version flip attributes items shipped before and after") {
    // customer 1: URGENT until order 2 (2024-02-01) flips to LOW.
    // item on order 1 ships 2024-01-10 -> URGENT version;
    // item on order 1 ships 2024-03-05 -> LOW version (PIT, not the
    // order's own attribute — the whole point of the lookup);
    // item on order 2 ships 2024-02-10 -> LOW.
    val orders = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), "URGENT"),
      (2L, 1L, ts("2024-02-01 00:00:00"), "LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val lineitem = Seq(
      (1L, ts("2024-01-10 00:00:00"), 100.0, 0.0),
      (1L, ts("2024-03-05 00:00:00"), 100.0, 0.0),
      (2L, ts("2024-02-10 00:00:00"), 100.0, 0.0))
      .toDF("l_orderkey", "l_shipdate", "l_extendedprice", "l_discount")
    val got = PitJoin.scd2PitJoinOf(orders, lineitem).collect()
      .map(r => (r.getAs[String]("prio_at_ship"), r.getAs[Int]("ship_year"),
        r.getAs[Long]("n_items"), r.getAs[Double]("revenue_q")))
    assert(got.toSeq == Seq(
      ("LOW", 2024, 2L, 200.0),
      ("URGENT", 2024, 1L, 100.0)))
  }

  test("B54: real tables — conservation holds and replay agrees") {
    val orders = Tables.orders(spark, sfDir)
    val lineitem = Tables.lineitem(spark, sfDir)
    val got = PitJoin.scd2PitJoinOf(orders, lineitem).collect()
    // conservation: every lineitem appears exactly once — matched
    // items in their unique version interval, pre-dimension items in
    // the explicit '(none)' bucket
    assert(got.map(_.getAs[Long]("n_items")).sum == lineitem.count())
    assert(got.exists(_.getAs[String]("prio_at_ship") == "(none)"),
      "generator ships some items before the first version; bucket expected")
    // driver-side replay: priority in force at ship time = priority of
    // the customer's last order at/before the ship date (date, key order)
    // real-table dates are NTZ — cast to the UTC session type so the
    // replay sees java.sql.Timestamp either way
    val byCust = orders
      .select($"o_custkey", $"o_orderkey",
        $"o_orderdate".cast("timestamp").as("o_orderdate"), $"o_orderpriority")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getString(3)))
      .groupBy(_._1)
      .view.mapValues(_.sortBy(o => (o._3.getTime, o._2))).toMap
    val custOf = orders.select("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = lineitem
      .select($"l_orderkey", $"l_shipdate".cast("timestamp").as("l_shipdate"),
        $"l_extendedprice", $"l_discount")
      .collect()
      .map { r =>
        val ship = r.getTimestamp(1)
        val before = byCust(custOf(r.getLong(0)))
          .takeWhile(_._3.getTime <= ship.getTime)
        val prio = if (before.isEmpty) "(none)" else before.last._4
        ((prio, ship.toLocalDateTime.getYear),
          (1L, BigDecimal(r.getDouble(2)) * (1 - BigDecimal(r.getDouble(3)))))
      }
      .groupBy(_._1).view.mapValues { vs =>
        (vs.map(_._2._1).sum, vs.map(_._2._2).sum)
      }.toMap
    val gotMap = got.map(r =>
      ((r.getAs[String]("prio_at_ship"), r.getAs[Int]("ship_year")),
        (r.getAs[Long]("n_items"), r.getAs[Double]("revenue_q")))).toMap
    assert(gotMap.keySet == expected.keySet)
    gotMap.foreach { case (k, (n, rev)) =>
      assert(n == expected(k)._1, s"n_items mismatch at $k")
      assert(math.abs(rev - expected(k)._2.toDouble) < 1e-6,
        s"revenue mismatch at $k")
    }
  }
}
