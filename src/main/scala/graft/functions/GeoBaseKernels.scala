package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** The embedded-geobase region family — regionToCity/Area/District/
  * Country/Continent/TopContinent, regionToPopulation, regionIn,
  * regionHierarchy, regionToName (reference
  * src/Functions/FunctionsEmbeddedDictionaries.h over
  * src/Dictionaries/Embedded/RegionsHierarchy.h + RegionsNames.h).
  *
  * The reference loads USER-SUPPLIED text files named in config:
  * `regions_hierarchy[_name].txt` (TSV `id \t parent \t type [\t
  * population]`, HierarchyFormatReader.cpp — negative ids/types are
  * garbage rows, negative parents clamp to 0) and
  * `regions_names_<lang>.txt` (TSV `id \t name`). The Spark analog
  * registers the same file contents per session ([[GeoBases]] — named
  * collections `regions_hierarchy[_name]` / `regions_names_<lang>`
  * carrying lines/path keys, or the programmatic register), resolves
  * the constant geobase/lang argument at PLAN time, and ships the
  * content as a plan literal — executor-local at any cluster size,
  * the same pattern as the custom-TLD lanes.
  *
  * Walk semantics (RegionsHierarchy.h): toX(region) returns the
  * nearest ancestor-or-self of type X (City=6, District=4, Area=5,
  * Country=3), toContinent the FIRST continent (type 1) climbing up,
  * toTopContinent the LAST one; 0 when none. regionIn(a, b) walks a's
  * parent chain and is true iff it reaches b (bounded depth).
  * regionHierarchy returns the region and all its ancestors. */
object GeoBaseKernels {

  private val MaxDepth = 500 // DBMS_HIERARCHICAL_DICTIONARY_MAX_DEPTH

  private final class Base(
      val parent: java.util.HashMap[Long, Long],
      val rtype: java.util.HashMap[Long, Int],
      val population: java.util.HashMap[Long, Long])

  private val cacheMax = 16
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Base]()
  private val nameCache = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.HashMap[Long, UTF8String]]()

  private def baseOf(blob: UTF8String): Base = {
    val key = blob.toString
    if (cache.size > cacheMax) cache.clear()
    cache.computeIfAbsent(key, k => {
      val parent = new java.util.HashMap[Long, Long]()
      val rtype = new java.util.HashMap[Long, Int]()
      val pop = new java.util.HashMap[Long, Long]()
      k.split("\n").foreach { line =>
        val f = line.trim.split("\t")
        if (f.length >= 3) scala.util.Try {
          val id = f(0).trim.toLong
          val par = f(1).trim.toLong
          val t = f(2).trim.toInt
          if (id > 0 && t >= 0) { // negative = garbage row (reader rule)
            parent.put(id, math.max(0L, par))
            rtype.put(id, t)
            if (f.length >= 4) pop.put(id, f(3).trim.toLong)
          }
        }
      }
      new Base(parent, rtype, pop)
    })
  }

  private def namesOf(blob: UTF8String)
      : java.util.HashMap[Long, UTF8String] = {
    val key = blob.toString
    if (nameCache.size > cacheMax) nameCache.clear()
    nameCache.computeIfAbsent(key, k => {
      val m = new java.util.HashMap[Long, UTF8String]()
      k.split("\n").foreach { line =>
        val f = line.split("\t", 2)
        if (f.length == 2) scala.util.Try(
          m.put(f(0).trim.toLong, UTF8String.fromString(f(1).trim)))
      }
      m
    })
  }

  /** kind: a RegionType (1 continent, 3 country, 4 district, 5 area,
    * 6 city) → nearest ancestor-or-self of that type; 100 → LAST
    * continent on the chain (top continent); 0 → direct parent. */
  def regionWalk(id: Long, blob: UTF8String, kind: Int): Long = {
    val b = baseOf(blob)
    if (kind == 0) return b.parent.getOrDefault(id, 0L)
    var cur = id
    var last = 0L
    var i = 0
    while (cur != 0 && i < MaxDepth) {
      val t = b.rtype.getOrDefault(cur, -1)
      if (kind == 100) { if (t == 1) last = cur }
      else if (t == kind) return cur
      cur = b.parent.getOrDefault(cur, 0L)
      i += 1
    }
    if (kind == 100) last else 0L
  }

  def regionIn(lhs0: Long, rhs: Long, blob: UTF8String): Boolean = {
    val b = baseOf(blob)
    var lhs = lhs0
    if (!b.parent.containsKey(lhs)) return false // out-of-base id
    var i = 0
    while (lhs != 0 && lhs != rhs && i < MaxDepth) {
      lhs = b.parent.getOrDefault(lhs, 0L)
      i += 1
    }
    lhs != 0
  }

  def regionHierarchy(id: Long, blob: UTF8String): ArrayData = {
    val b = baseOf(blob)
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    if (b.parent.containsKey(id)) {
      var cur = id
      var i = 0
      while (cur != 0 && i < MaxDepth) {
        out += cur
        cur = b.parent.getOrDefault(cur, 0L)
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  def regionPopulation(id: Long, blob: UTF8String): Long =
    baseOf(blob).population.getOrDefault(id, 0L)

  /** Unknown region → empty string (the reference's empty StringRef). */
  def regionName(id: Long, namesBlob: UTF8String): UTF8String =
    Option(namesOf(namesBlob).get(id)).getOrElse(UTF8String.EMPTY_UTF8)
}

/** Session registry of geobases (EmbeddedDictionaries analog): the
  * hierarchy under `regions_hierarchy[_<name>]`, per-language names
  * under `regions_names_<lang>` — programmatic register or named
  * collections with lines/path keys (the config-named files the
  * reference loads). Unknown language falls back to `ru`
  * (RegionsNames.h maps every language's fallback to ru). */
object GeoBases {

  private val bases =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  @volatile var collectionProvider: String => Option[Map[String, String]] =
    _ => None

  def register(name: String, lines: Seq[String]): Unit =
    bases.put(name.toLowerCase, lines.mkString("\n"))

  def drop(name: String): Unit = bases.remove(name.toLowerCase)

  private def resolve(key: String): Option[String] =
    Option(bases.get(key)).orElse(collectionProvider(key).flatMap { kv =>
      kv.get("lines").map(_.replace("\\n", "\n"))
        .orElse(kv.get("path").map(p => new String(
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
          "UTF-8")))
    })

  /** The hierarchy blob for geobase `name` ('' = the default one). */
  def hierarchyBlob(name: String): String = {
    val key = if (name.isEmpty) "regions_hierarchy"
      else s"regions_hierarchy_${name.toLowerCase}"
    resolve(key).getOrElse(throw new IllegalArgumentException(
      s"geobase `$key` is not registered (CREATE NAMED COLLECTION $key " +
        "AS lines = '...' or path = '...')"))
  }

  /** The names blob for `lang`, falling back to ru. */
  def namesBlob(lang: String): String = {
    val key = s"regions_names_${lang.toLowerCase}"
    resolve(key).orElse(resolve("regions_names_ru")).getOrElse(
      throw new IllegalArgumentException(
        s"region names `$key` are not registered (and no " +
          "regions_names_ru fallback)"))
  }
}
