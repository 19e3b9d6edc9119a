package graft.sql

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.graft.{Base32Decode, Base32Encode, Base58Decode, Base58Encode, GenerateSnowflakeID, GenerateULID, GenerateUUIDv7, GeohashDecode, GeohashEncode, GeohashesInBox}
import org.apache.spark.sql.types._

/** Round-7 registry sweep (registerFunctions.cpp order, continuing the
  * Tail/Tail2/Tail3 packs):
  *  - base58/base32 codecs (base58Encode.cpp, base32Encode.cpp — both
  *    re-implemented from the published schemes);
  *  - geohash family (geohashEncode.cpp/geohashDecode.cpp/
  *    geohashesInBox.cpp — the public geohash algorithm);
  *  - id generators: generateUUIDv4 (Spark's Uuid), generateUUIDv7
  *    (RFC 9562), generateULID (public ULID spec), generateSnowflakeID
  *    (ms<<22 | machine | seq — the layout the Tail pack's
  *    snowflake<->DateTime codecs already speak);
  *  - addDate/subDate (addDate.cpp — the analyzer resolves date ±
  *    interval arithmetic);
  *  - fromUTCTimestamp/toUTCTimestamp (MySQL-compat names in
  *    registerFunctions — Spark's expressions of the same semantics);
  *  - FQDN/fullHostName/displayName (serverConstants.cpp) + curdate.
  */
object ChRegistryTail4 {

  private def hostLit: Expression =
    Literal(java.net.InetAddress.getLocalHost.getCanonicalHostName)

  val builders: Map[String, Seq[Expression] => Expression] = Map(
    // ---- codecs ------------------------------------------------------
    "base58encode" -> (args => Base58Encode(args.head)),
    "base58decode" -> (args => Base58Decode(args.head)),
    "base32encode" -> (args => Base32Encode(args.head)),
    "base32decode" -> (args => Base32Decode(args.head)),
    // tryBase*Decode: NULL on malformed input (the reference's try* lane)
    // — TryEval wraps the strict decoder
    "trybase58decode" -> (args => TryEval(Base58Decode(args.head))),
    "trybase32decode" -> (args => TryEval(Base32Decode(args.head))),

    // ---- geohash (geohashEncode.cpp et al.) --------------------------
    "geohashencode" -> (args => GeohashEncode(args(0), args(1),
      if (args.length > 2) args(2) else Literal(12))),
    "geohashdecode" -> (args => GeohashDecode(args.head)),
    "geohashesinbox" -> (args => GeohashesInBox(args)),

    // ---- id generators ----------------------------------------------
    "generateuuidv4" -> (_ => Uuid()),
    "generateuuidv7" -> (_ => GenerateUUIDv7()),
    "generateulid" -> (_ => GenerateULID()),
    "generatesnowflakeid" -> (_ => GenerateSnowflakeID()),

    // ---- date arithmetic + tz conversions ----------------------------
    // addDate(d, INTERVAL ...) — ResolveBinaryArithmetic turns the Add
    // into the proper date/timestamp + interval node
    "adddate" -> (args => Add(args(0), args(1))),
    "subdate" -> (args => Subtract(args(0), args(1))),
    "fromutctimestamp" -> (args => FromUTCTimestamp(args(0), args(1))),
    "toutctimestamp" -> (args => ToUTCTimestamp(args(0), args(1))),
    // curdate resolves through the Spark builtin of identical semantics
    // (deliberately unshadowed — ChRegistrySpec parity pin)

    // ---- arrayJoin (the FUNCTION form of ARRAY JOIN — array/arrayJoin
    // .cpp, the reference's row-multiplying expression): maps to Spark's
    // Explode generator, which the analyzer extracts from the SELECT list
    // (one generator per select — the reference's multi-arrayJoin
    // cartesian is the documented difference) -------------------------
    "arrayjoin" -> (args =>
      org.apache.spark.sql.catalyst.expressions.Explode(args.head)),

    // ---- server constants (serverConstants.cpp) ----------------------
    "fqdn" -> (_ => hostLit),
    "fullhostname" -> (_ => hostLit),
    "displayname" -> (_ => hostLit)
  )
}
