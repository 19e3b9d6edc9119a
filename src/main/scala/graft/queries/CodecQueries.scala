package graft.queries

import graft.{Q, QueryPack, Tables}
import graft.sources.Codecs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Column-codec battery (reference `src/Compression/CompressionCodec*.cpp`,
  * SURVEY §2.1 storage line): every query pushes a real corpus column
  * through a codec (or a `CODEC(specialized, general)` chain) inside
  * `mapPartitions` — compress, decompress, re-aggregate — and the DuckDB
  * oracle aggregates the original column directly, so a single flipped bit
  * anywhere in the codec fails the hash compare.
  *
  * Scale shape: codecs run per-partition on the executors (the same
  * placement as the reference's per-part compression threads); no shuffle
  * is introduced — the aggregation after the roundtrip shuffles exactly as
  * much as the plain aggregation would. Ratio characteristics (the reason
  * each codec exists) are pinned in `CodecsSpec`, not here.
  */
object CodecQueries extends QueryPack {

  /** Roundtrip a Long column through a codec chain partition-wise. */
  private def roundtripLongs(df: DataFrame, column: String, chain: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(column).cast("long")).as[Long]
      .mapPartitions { it =>
        val values = it.toArray
        if (values.isEmpty) Iterator.empty
        else {
          val block = Codecs.compressChain(chain, Codecs.longsToBytes(values))
          Codecs.bytesToLongs(Codecs.decompressChain(chain.length, block)).iterator
        }
      }.toDF(column)
  }

  /** Roundtrip a Double column (bit-exact: raw IEEE-754 bits travel). */
  private def roundtripDoubles(df: DataFrame, column: String, chain: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(column).cast("double")).as[Double]
      .mapPartitions { it =>
        val values = it.toArray
        if (values.isEmpty) Iterator.empty
        else {
          val block = Codecs.compressChain(chain, Codecs.doublesToBytes(values))
          Codecs.bytesToDoubles(Codecs.decompressChain(chain.length, block)).iterator
        }
      }.toDF(column)
  }

  override def queries: Seq[Q] = Seq(

    // CODEC(Delta, ZSTD) — the reference's default choice for sorted key
    // columns (CompressionCodecDelta.cpp + CompressionCodecZSTD.cpp).
    Q.df("q_codec_delta_zstd", """
      SELECT COUNT(*) AS n, CAST(SUM(l_orderkey) AS BIGINT) AS sum_key,
        MIN(l_orderkey) AS min_key, MAX(l_orderkey) AS max_key
      FROM lineitem""") { (s, dir) =>
      Tables.register(s, dir)
      roundtripLongs(Tables.load(s, dir, "lineitem"), "l_orderkey", Seq("Delta(8)", "ZSTD(3)"))
        .agg(count(lit(1)).as("n"), sum("l_orderkey").as("sum_key"),
          min("l_orderkey").as("min_key"), max("l_orderkey").as("max_key"))
    },

    // DoubleDelta on event timestamps (µs since epoch) — the Gorilla-paper
    // timestamp scheme the reference applies to time columns
    // (CompressionCodecDoubleDelta.cpp).
    Q.df("q_codec_doubledelta_ts", """
      SELECT COUNT(*) AS n,
        MIN(CAST(epoch_us(ts) AS BIGINT)) AS min_us,
        MAX(CAST(epoch_us(ts) AS BIGINT)) AS max_us,
        CAST(SUM(epoch_us(ts) % 1000003) AS BIGINT) AS sum_mod
      FROM events""") { (s, dir) =>
      Tables.register(s, dir)
      val micros = Tables.load(s, dir, "events")
        .select(unix_micros(col("ts")).as("us"))
      roundtripLongs(micros, "us", Seq("DoubleDelta"))
        .agg(count(lit(1)).as("n"), min("us").as("min_us"), max("us").as("max_us"),
          sum(col("us") % 1000003L).as("sum_mod"))
    },

    // Gorilla XOR floats on l_extendedprice (CompressionCodecGorilla.cpp).
    // Bit-exact roundtrip → the decimal-exact SUM matches the oracle's.
    Q.df("q_codec_gorilla_price", """
      SELECT COUNT(*) AS n,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM lineitem""") { (s, dir) =>
      Tables.register(s, dir)
      roundtripDoubles(Tables.load(s, dir, "lineitem"), "l_extendedprice", Seq("Gorilla"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
    },

    // T64 bit-matrix transpose on the small-range l_quantity lane
    // (CompressionCodecT64.cpp).
    Q.df("q_codec_t64_quantity", """
      SELECT COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        MAX(CAST(l_quantity AS BIGINT)) AS max_qty
      FROM lineitem""") { (s, dir) =>
      Tables.register(s, dir)
      roundtripLongs(Tables.load(s, dir, "lineitem"), "l_quantity", Seq("T64"))
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"),
          max("l_quantity").as("max_qty"))
    },

    // CODEC(GCD, LZ4) on cents-scaled totals (CompressionCodecGCD.cpp):
    // a fixed-unit lane divides through by its GCD before byte compression.
    Q.df("q_codec_gcd_lz4", """
      SELECT COUNT(*) AS n,
        CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      FROM orders""") { (s, dir) =>
      Tables.register(s, dir)
      val cents = Tables.load(s, dir, "orders")
        .select(round(col("o_totalprice") * 100).cast("long").as("cents"))
      roundtripLongs(cents, "cents", Seq("GCD", "LZ4"))
        .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
    }
  )
}
