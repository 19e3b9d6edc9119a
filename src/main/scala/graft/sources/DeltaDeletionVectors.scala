package graft.sources

import java.util.zip.CRC32

import org.apache.hadoop.fs.{FileSystem, Path}
import org.roaringbitmap.RoaringBitmap

/** Delta Lake deletion-vector codec — the round-13 verdict's #1
  * remaining capability gap: modern Delta writers enable DVs by
  * default, so the `minReaderVersion > 1` loud gate was the first wall
  * a real user hit. This implements the PUBLIC spec (delta.io
  * PROTOCOL.md, "Deletion Vectors" + "Deletion Vector Format"
  * sections; the reference reads the same format through the vendored
  * delta-kernel-rs FFI — src/Storages/ObjectStorage/DataLakes/DeltaLake/
  * TableSnapshot.cpp):
  *
  * Descriptor (in `add.deletionVector`):
  *   storageType  "u" (file, path derived from a Z85-encoded UUID),
  *                "p" (file, absolute path), "i" (inline Z85 data)
  *   pathOrInlineDv / offset / sizeInBytes / cardinality
  *
  * On-disk DV file (`deletion_vector_<uuid>.bin`):
  *   byte 0      format version (1)
  *   per DV at descriptor `offset`:
  *     <dataSize: 4B big-endian>   == descriptor sizeInBytes
  *     <data: dataSize bytes>
  *     <checksum: 4B big-endian>   CRC-32 of <data>
  *
  * The `data` blob (also what "i" inlines):
  *   <magic: 4B little-endian>     1681511377 = the "portable"
  *                                 RoaringBitmapArray format marker
  *   <numBitmaps: 8B little-endian>
  *   per bitmap: <key: 4B LE>      (row index >>> 32)
  *               <32-bit RoaringBitmap, official portable format>
  *
  * The 32-bit bitmap ser/de delegates to org.roaringbitmap (the
  * library that DEFINES the RoaringFormatSpec portable format, already
  * on Spark's classpath for shuffle tracking). A bitmap holds the
  * 0-based row positions of DELETED rows within one parquet data file
  * — masking happens in DeltaLakeSource by filtering on
  * `_metadata.row_index` membership.
  */
object DeltaDeletionVectors {

  final case class DvDescriptor(storageType: String, pathOrInlineDv: String,
      offset: Option[Int], sizeInBytes: Int, cardinality: Long)

  // ----------------------------------------------------------- Z85 codec
  // ZeroMQ spec 32 (rfc.zeromq.org/spec/32) — the Base85 variant the
  // Delta protocol pins for UUIDs and inline DVs. 4 bytes ↔ 5 chars.

  private val z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      ".-:+=^!/*?&<>()[]{}@%$#"
  private val z85Decode: Array[Int] = {
    val m = Array.fill(128)(-1)
    z85Alphabet.zipWithIndex.foreach { case (c, i) => m(c.toInt) = i }
    m
  }

  /** Encode bytes (length must be a multiple of 4). */
  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0,
      s"z85: input length ${bytes.length} is not a multiple of 4")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (bytes(i + j) & 0xffL); j += 1 }
      var div = 85L * 85 * 85 * 85
      while (div > 0) {
        sb.append(z85Alphabet(((v / div) % 85).toInt))
        div /= 85
      }
      i += 4
    }
    sb.toString
  }

  /** Decode a Z85 string (length must be a multiple of 5). */
  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0,
      s"z85: encoded length ${s.length} is not a multiple of 5")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    var o = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) z85Decode(c.toInt) else -1
        require(d >= 0, s"z85: invalid character '$c'")
        v = v * 85 + d
        j += 1
      }
      var k = 3
      while (k >= 0) { out(o + (3 - k)) = ((v >>> (8 * k)) & 0xff).toByte; k -= 1 }
      i += 5; o += 4
    }
    out
  }

  def z85EncodeUuid(uuid: java.util.UUID): String = {
    val b = java.nio.ByteBuffer.allocate(16)
    b.putLong(uuid.getMostSignificantBits)
    b.putLong(uuid.getLeastSignificantBits)
    z85Encode(b.array())
  }

  def z85DecodeUuid(encoded: String): java.util.UUID = {
    val b = java.nio.ByteBuffer.wrap(z85Decode(encoded))
    new java.util.UUID(b.getLong, b.getLong)
  }

  // ------------------------------------------------- bitmap array codec

  private val PortableMagic = 1681511377

  /** Sorted deleted row indexes → the `data` blob (magic + portable
    * RoaringBitmapArray). */
  def serializeBitmaps(rowIndexes: Seq[Long]): Array[Byte] = {
    val byKey = rowIndexes.groupBy(v => (v >>> 32).toInt).toSeq.sortBy(_._1)
    serializeBitmapMap(byKey.map { case (k, vs) =>
      val rb = new RoaringBitmap()
      vs.foreach(v => rb.add(v.toInt))
      (k, rb)
    })
  }

  /** (key → 32-bit bitmap) pairs → the `data` blob. Keys must be the
    * high 32 bits of the row indexes; pairs serialize in ascending key
    * order (the spec's array order). Shared by the Seq[Long] helper and
    * the distributed per-file bitmap build in the DV-writing DELETE. */
  def serializeBitmapMap(bitmaps0: Seq[(Int, RoaringBitmap)]): Array[Byte] = {
    val bitmaps = bitmaps0.sortBy(_._1)
    bitmaps.foreach(_._2.runOptimize())
    val size = 4 + 8 + bitmaps.map(4 + _._2.serializedSizeInBytes()).sum
    val buf = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(PortableMagic)
    buf.putLong(bitmaps.length.toLong)
    bitmaps.foreach { case (k, rb) => buf.putInt(k); rb.serialize(buf) }
    buf.array()
  }

  /** OR-merge two `data` blobs (an existing file DV + newly deleted
    * rows) into one, returning (merged blob, merged cardinality). */
  def mergeBlobs(a: Array[Byte], b: Array[Byte]): (Array[Byte], Long) = {
    val m = scala.collection.mutable.Map.empty[Int, RoaringBitmap]
    deserializeBitmaps(a).foreach { case (k, rb) => m(k) = rb.clone() }
    deserializeBitmaps(b).foreach { case (k, rb) =>
      m.get(k) match {
        case Some(cur) => cur.or(rb)
        case None => m(k) = rb.clone()
      }
    }
    val blob = serializeBitmapMap(m.toSeq)
    (blob, m.valuesIterator.map(_.getLongCardinality).sum)
  }

  /** The `data` blob → per-key 32-bit bitmaps. Trailing bytes beyond
    * the declared bitmap count are ignored (inline Z85 data may carry
    * alignment padding). */
  def deserializeBitmaps(data: Array[Byte]): Map[Int, RoaringBitmap] = {
    val buf = java.nio.ByteBuffer.wrap(data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val magic = buf.getInt
    require(magic == PortableMagic,
      s"deltaLake DV: magic $magic is not the portable RoaringBitmapArray " +
        s"marker $PortableMagic — corrupt or unsupported deletion vector")
    val n = buf.getLong
    require(n >= 0 && n <= Int.MaxValue, s"deltaLake DV: bitmap count $n")
    var pos = 12 // past magic + count
    (0L until n).map { _ =>
      val key = java.nio.ByteBuffer.wrap(data, pos, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
      pos += 4
      val rb = new RoaringBitmap()
      // a fresh slice per bitmap — deserialize must start exactly at the
      // bitmap's first byte, and sizing comes from the parsed result
      val slice = java.nio.ByteBuffer.wrap(data, pos, data.length - pos)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      rb.deserialize(slice)
      pos += rb.serializedSizeInBytes()
      key -> rb
    }.toMap
  }

  def contains(bitmaps: Map[Int, RoaringBitmap], rowIndex: Long): Boolean =
    bitmaps.get((rowIndex >>> 32).toInt)
      .exists(_.contains(rowIndex.toInt))

  // ------------------------------------------------------------ file IO

  /** Resolve the descriptor to its DV file path ("u"/"p" storage). */
  def dvFilePath(tableRoot: String, d: DvDescriptor): Path = d.storageType match {
    case "u" =>
      require(d.pathOrInlineDv.length >= 20,
        s"deltaLake DV: 'u' pathOrInlineDv too short: ${d.pathOrInlineDv}")
      val prefix = d.pathOrInlineDv.dropRight(20)
      val uuid = z85DecodeUuid(d.pathOrInlineDv.takeRight(20))
      val name = s"deletion_vector_$uuid.bin"
      if (prefix.isEmpty) new Path(tableRoot, name)
      else new Path(new Path(tableRoot, prefix), name)
    case "p" => new Path(d.pathOrInlineDv)
    case other => throw new IllegalArgumentException(
      s"deltaLake DV: storageType '$other' has no file path")
  }

  /** Load the descriptor's `data` blob (inline or from the DV file,
    * with the size and CRC-32 of the stored form verified). */
  def readData(conf: org.apache.hadoop.conf.Configuration, tableRoot: String,
      d: DvDescriptor): Array[Byte] = d.storageType match {
    case "i" => z85Decode(d.pathOrInlineDv)
    case "u" | "p" =>
      val p = dvFilePath(tableRoot, d)
      val fs = p.getFileSystem(conf)
      val off = d.offset.getOrElse(throw new IllegalArgumentException(
        s"deltaLake DV: file-stored deletion vector has no offset ($p)"))
      val in = fs.open(p)
      try {
        in.seek(off.toLong)
        val storedSize = in.readInt() // big-endian (DataInput contract)
        require(storedSize == d.sizeInBytes,
          s"deltaLake DV: stored size $storedSize != descriptor " +
            s"sizeInBytes ${d.sizeInBytes} at $p:$off")
        val data = new Array[Byte](storedSize)
        in.readFully(data)
        val storedCrc = in.readInt()
        val crc = new CRC32(); crc.update(data)
        require(storedCrc == crc.getValue.toInt,
          s"deltaLake DV: checksum mismatch at $p:$off")
        data
      } finally in.close()
    case other => throw new IllegalArgumentException(
      s"deltaLake DV: unsupported storageType '$other' (u/p/i)")
  }

  /** Write one DV file holding `blobs` (each a `data` blob), returning
    * each blob's descriptor offset. Used by fixtures/tests and the
    * write path — real tables written by other engines read the same
    * way because both follow PROTOCOL.md. */
  def writeDvFile(fs: FileSystem, path: Path,
      blobs: Seq[Array[Byte]]): Seq[Int] = {
    val out = fs.create(path, true)
    try {
      out.write(1) // format version
      var pos = 1
      blobs.map { data =>
        val off = pos
        out.writeInt(data.length)
        out.write(data)
        val crc = new CRC32(); crc.update(data)
        out.writeInt(crc.getValue.toInt)
        pos += 4 + data.length + 4
        off
      }
    } finally out.close()
  }
}
