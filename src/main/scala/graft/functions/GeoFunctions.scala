package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geo scalar functions (round-2 verdict missing #6).
  *
  * Reference anchors: src/Functions/geohashEncode.cpp / geohashDecode.cpp
  * (interval-halving base32 geohash), src/Functions/pointInPolygon.cpp
  * (crossing-number test), greatCircleDistance.cpp (haversine — already in
  * Extras2).
  *
  * Everything here unrolls to pure arithmetic/bit Catalyst expressions
  * (shiftright/&/floor/substring) — fully codegen'd, no UDFs — and the
  * same arithmetic is reproducible in the DuckDB oracle.
  */
object GeoFunctions {

  private val Alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** geohashEncode(lon, lat, precision): standard base32 geohash. The
    * interval-halving of the reference is equivalently computed as fixed
    * grid cells: precision p → ceil(5p/2) lon bits + floor(5p/2) lat bits,
    * interleaved lon-first, 5 bits per base32 char. */
  def geohashEncode(lon: Column, lat: Column, precision: Int = 6): Column = {
    require(precision >= 1 && precision <= 12, "precision 1..12")
    val totalBits = precision * 5
    val lonBits = (totalBits + 1) / 2
    val latBits = totalBits / 2
    val cellLon = floor((lon + 180.0) / 360.0 * pow(lit(2.0), lit(lonBits)))
      .cast("long")
    val cellLat = floor((lat + 90.0) / 180.0 * pow(lit(2.0), lit(latBits)))
      .cast("long")
    // clamp lon=180/lat=90 onto the last cell
    val cLon = least(cellLon, lit((1L << lonBits) - 1))
    val cLat = least(cellLat, lit((1L << latBits) - 1))
    // interleave: even positions (from MSB, 0-based) take lon bits, odd lat
    val value = (0 until totalBits).map { pos =>
      val fromLon = pos % 2 == 0
      val idx = pos / 2 // bit index from the MSB of that axis
      val src = if (fromLon) cLon else cLat
      val bits = if (fromLon) lonBits else latBits
      (shiftright(src, bits - 1 - idx).bitwiseAND(lit(1L))) * lit(1L << (totalBits - 1 - pos))
    }.reduce(_ + _)
    concat((0 until precision).map { c =>
      val idx = shiftright(value, (precision - 1 - c) * 5).bitwiseAND(lit(31L))
      lit(Alphabet).substr(idx.cast("int") + 1, lit(1))
    }: _*)
  }

  /** geohashDecode(hash): centroid (lon, lat) of the cell a geohash names —
    * struct(lon, lat). Inverse of `geohashEncode`: base32 digits → the
    * interleaved bit value → per-axis cells → cell-centre coordinates. */
  def geohashDecode(hash: Column, precision: Int = 6): Column = {
    val totalBits = precision * 5
    val lonBits = (totalBits + 1) / 2
    val latBits = totalBits / 2
    val value = (0 until precision).map { c =>
      val digit = (instr(lit(Alphabet), hash.substr(lit(c + 1), lit(1))) - 1).cast("long")
      digit * lit(1L << ((precision - 1 - c) * 5))
    }.reduce(_ + _)
    val cellLon = (0 until lonBits).map { idx => // idx from MSB of axis
      shiftright(value, totalBits - 1 - 2 * idx).bitwiseAND(lit(1L)) *
        lit(1L << (lonBits - 1 - idx))
    }.reduce(_ + _)
    val cellLat = (0 until latBits).map { idx =>
      shiftright(value, totalBits - 2 - 2 * idx).bitwiseAND(lit(1L)) *
        lit(1L << (latBits - 1 - idx))
    }.reduce(_ + _)
    struct(
      ((cellLon.cast("double") + 0.5) / math.pow(2.0, lonBits) * 360.0 - 180.0).as("lon"),
      ((cellLat.cast("double") + 0.5) / math.pow(2.0, latBits) * 180.0 - 90.0).as("lat"))
  }

  /** pointInPolygon((x, y), polygon): crossing-number (even-odd) test
    * against a FIXED polygon, unrolled one expression per edge —
    * src/Functions/pointInPolygon.cpp's non-indexed path. */
  def pointInPolygon(x: Column, y: Column, poly: Seq[(Double, Double)]): Column = {
    val n = poly.length
    val crossings = (0 until n).map { i =>
      val (x1, y1) = poly(i)
      val (x2, y2) = poly((i + 1) % n)
      when(
        (lit(y1) > y) =!= (lit(y2) > y),
        when(x < (lit(x2 - x1) * (y - lit(y1)) / lit(y2 - y1) + lit(x1)), lit(1))
          .otherwise(lit(0))
      ).otherwise(lit(0))
    }.reduce(_ + _)
    crossings % 2 === 1
  }
}
