package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Custom-TLD-list URL functions — the reference's
  * firstSignificantSubdomainCustom / cutToFirstSignificantSubdomainCustom
  * families (src/Functions/URL/FirstSignificantSubdomainCustomImpl.h,
  * cutToFirstSignificantSubdomainCustom.cpp,
  * ExtractFirstSignificantSubdomain.h) over USER-SUPPLIED public-suffix
  * lists (src/Common/TLDListsHolder.cpp parses the files named in the
  * `top_level_domains_lists` config: one suffix per line, `*.foo`
  * wildcard entries, `!bar.foo` exceptions, `//` comments).
  *
  * Spark rendering: the list registers per session ([[TldLists]] — a
  * named collection with `lines`/`path` keys, or the programmatic
  * register(), mirroring TLDListsHolder::getTldList(name)); the
  * FUNCTION resolves the constant list NAME at plan time and embeds the
  * list CONTENT as a plan literal, so the kernel is executor-local
  * with no driver-global lookup — the plan ships the list, exactly like
  * a broadcast small-dim. Kernels are StaticInvoke (codegen-inlined),
  * with a bounded content-keyed memo for the parsed suffix table.
  */
object TldKernels {

  private val TldRegular = 1
  private val TldAny = 2 // `*.foo` — stored under "foo"
  private val TldExclude = 3 // `!bar.foo` — stored under "bar.foo"

  private val cacheMax = 64
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.HashMap[String, Integer]]()

  /** Parse the embedded list blob (one entry per line, the
    * TLDListsHolder::parseAndAddTldList line grammar). */
  private def tableOf(blob: UTF8String): java.util.HashMap[String, Integer] = {
    val key = blob.toString
    if (cache.size > cacheMax) cache.clear()
    cache.computeIfAbsent(key, k => {
      val m = new java.util.HashMap[String, Integer]()
      k.split("\n").foreach { raw =>
        val line = raw.trim
        if (line.nonEmpty && !line.startsWith("//")) {
          if (line.startsWith("*.")) m.put(line.substring(2), TldAny)
          else if (line.startsWith("!")) m.put(line.substring(1), TldExclude)
          else m.put(line, TldRegular)
        }
      }
      m
    })
  }

  /** Host of a URL, scheme-less forms accepted (the same lenient
    * extraction the registry's `domain` lane uses); trailing dot cut
    * (ExtractFirstSignificantSubdomain "cut useless dot"). */
  private def hostOf(url: String, stripWww: Boolean): String = {
    var s = url
    val sch = s.indexOf("://")
    if (sch >= 0 && sch + 3 <= s.length &&
        s.substring(0, sch).matches("[A-Za-z][A-Za-z0-9+.-]*"))
      s = s.substring(sch + 3)
    var end = s.length
    var i = 0
    while (i < s.length && end == s.length) {
      val c = s.charAt(i)
      if (c == '/' || c == '?' || c == '#') end = i
      i += 1
    }
    var auth = s.substring(0, end)
    val at = auth.lastIndexOf('@')
    if (at >= 0) auth = auth.substring(at + 1)
    val colon = auth.indexOf(':')
    if (colon >= 0) auth = auth.substring(0, colon)
    if (auth.endsWith(".")) auth = auth.substring(0, auth.length - 1)
    if (stripWww && auth.startsWith("www.")) auth = auth.substring(4)
    auth
  }

  private def dotsOf(host: String): Array[Int] = {
    var n = 0
    var i = 0
    while (i < host.length) { if (host.charAt(i) == '.') n += 1; i += 1 }
    val out = new Array[Int](n)
    var j = 0
    i = 0
    while (i < host.length) {
      if (host.charAt(i) == '.') { out(j) = i; j += 1 }
      i += 1
    }
    out
  }

  /** firstSignificantSubdomainCustom[RFC]: the reference routes the
    * custom FSS through ExtractFirstSignificantSubdomain::execute — the
    * classic last-three-dots walk where the custom list is consulted
    * for the LAST TWO labels only (a non-NONE entry of ANY kind counts;
    * firstSignificantSubdomainCustom.cpp + the `if (lookup(host))`
    * truthiness in ExtractFirstSignificantSubdomain.h:85). */
  def fssCustom(url: UTF8String, blob: UTF8String): UTF8String = {
    val host = hostOf(url.toString, stripWww = true)
    if (host.isEmpty) return UTF8String.EMPTY_UTF8
    val dots = dotsOf(host)
    if (dots.length == 0) return UTF8String.fromString(host)
    if (dots.length == 1)
      return UTF8String.fromString(host.substring(0, dots(0)))
    val m = tableOf(blob)
    val last = dots(dots.length - 1)
    val second = dots(dots.length - 2)
    val third = if (dots.length >= 3) dots(dots.length - 3) else -1
    if (m.containsKey(host.substring(second + 1)))
      UTF8String.fromString(host.substring(third + 1, second))
    else
      UTF8String.fromString(host.substring(second + 1, last))
  }

  /** cutToFirstSignificantSubdomainCustom[WithWWW][RFC]:
    * ExtractFirstSignificantSubdomain::executeCustom — the dot walk
    * left-to-right (longest listed suffix wins) honoring REGULAR /
    * `*.` wildcard / `!` exception entries, falling back to the
    * second-level domain; the cut keeps everything from the first
    * significant subdomain through the domain end. */
  def cutToFssCustom(url: UTF8String, blob: UTF8String,
      withWww: Boolean): UTF8String = {
    val host = hostOf(url.toString, stripWww = !withWww)
    if (host.isEmpty) return UTF8String.EMPTY_UTF8
    val m = tableOf(blob)
    val dots = dotsOf(host)
    var prevDot = -1 // last_periods[0]: begin-1 initially
    var prevPrevDot = -2 // last_periods[1]: -2 = "unset" (nullptr)
    var excluded: String = null
    var k = 0
    while (k < dots.length) {
      val d = dots(k)
      val suffix = host.substring(d + 1)
      val t = m.get(suffix)
      if (t != null && t.intValue() == TldRegular)
        return UTF8String.fromString(host.substring(prevDot + 1))
      if (t != null && t.intValue() == TldAny) {
        val regularHost = host.substring(prevDot + 1)
        return if (prevPrevDot != -2 && excluded != regularHost)
          UTF8String.fromString(host.substring(prevPrevDot + 1))
        else UTF8String.fromString(regularHost)
      }
      if (t != null && t.intValue() == TldExclude) excluded = suffix
      prevPrevDot = prevDot
      prevDot = d
      k += 1
    }
    if (dots.length == 0) UTF8String.fromString(host) // first-level: itself
    else {
      val start = if (dots.length >= 2) dots(dots.length - 2) else -1
      UTF8String.fromString(host.substring(start + 1))
    }
  }
}

/** Session registry of named TLD lists (TLDListsHolder analog). Lists
  * come from `register()` or from a NAMED COLLECTION of the same name
  * carrying a `lines` key (newline-separated entries) or a `path` key
  * (a file in the reference's list format — the faithful analog of the
  * config-named files TLDListsHolder::parseConfig loads). */
object TldLists {

  private val lists =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Wired by ChFunctionRegistry.install to the dialect's named
    * collections, so `CREATE NAMED COLLECTION mytlds AS lines = '...'`
    * is a registration surface too. */
  @volatile var collectionProvider: String => Option[Map[String, String]] =
    _ => None

  def register(name: String, lines: Seq[String]): Unit =
    lists.put(name.toLowerCase, lines.mkString("\n"))

  def drop(name: String): Unit = lists.remove(name.toLowerCase)

  /** The list content for `name`, as the newline blob the kernels
    * parse. Throws the TLD_LIST_NOT_FOUND analog when nothing matches
    * (TLDListsHolder::getTldList). */
  def blob(name: String): String = {
    val direct = Option(lists.get(name.toLowerCase))
    val fromCollection = direct.orElse(
      collectionProvider(name).flatMap { kv =>
        kv.get("lines").map(_.replace("\\n", "\n").replace(",", "\n"))
          .orElse(kv.get("path").map(p =>
            new String(java.nio.file.Files.readAllBytes(
              java.nio.file.Paths.get(p)), "UTF-8")))
      })
    fromCollection.getOrElse(throw new IllegalArgumentException(
      s"TLD list $name does not exist"))
  }
}
