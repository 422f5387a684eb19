package graft.queries

import org.apache.spark.sql.functions._

import graft.GraftSuite

/** The geohash SQL expression must agree with the CANONICAL algorithm
  * (interval-halving bit refinement, lon first, base32) — pinned here
  * against an independent reference implementation so a regression in
  * the div/mod bit-interleave generation cannot hide behind the oracle
  * (which executes the same generated fragment). */
class GeoSpec extends GraftSuite {

  private def canonical(lat: Double, lon: Double, p: Int): String = {
    val b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
    var (latLo, latHi, lonLo, lonHi) = (-90.0, 90.0, -180.0, 180.0)
    val bits = (0 until 5 * p).map { i =>
      if (i % 2 == 0) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { lonLo = mid; 1 } else { lonHi = mid; 0 }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { latLo = mid; 1 } else { latHi = mid; 0 }
      }
    }
    bits.grouped(5).map(g => b32(g.foldLeft(0)((a, b) => a * 2 + b))).mkString
  }

  test("generated geohash SQL matches the canonical interval-halving encoder") {
    val p = 3
    val rows = spark.range(1, 500).toDF("c_custkey")
      .select(col("c_custkey"),
        expr(Geo.latSql).as("lat"), expr(Geo.lonSql).as("lon"),
        expr(Geo.geohashBitsSql("div", p)).as("bits"))
      .selectExpr("c_custkey", "lat", "lon", Geo.geohashCharsSql("div", p) + " AS gh")
      .collect()
    rows.foreach { r =>
      val want = canonical(r.getDouble(1), r.getDouble(2), p)
      assert(r.getString(3) === want,
        s"custkey=${r.getLong(0)} lat=${r.getDouble(1)} lon=${r.getDouble(2)}")
    }
  }
}
