package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** lemmatize / synonyms — the reference's dictionary-backed NLP
  * functions (src/Functions/lemmatize.cpp over
  * src/Interpreters/Lemmatizers.h; src/Functions/synonyms.cpp over
  * src/Interpreters/SynonymsExtensions.h). In the reference both load
  * DICTIONARY FILES named in the server config (`lemmatizers` /
  * `synonyms_extensions` sections); this engine's analog registers the
  * dictionaries per session ([[NlpDictionaries]] — programmatic
  * register() or a NAMED COLLECTION, the same surface as TLD lists and
  * geobases). DOCUMENTED DEVIATION: the reference's RdrLemmatizer is a
  * trained-model binary; the session dictionary here is an explicit
  * form→lemma lookup table (the model FILE is environment this
  * container lacks — the function surface, constant-name plan-time
  * resolution, and miss semantics match).
  *
  * Miss semantics match the reference: lemmatize returns the token
  * UNCHANGED when the dictionary has no entry (RdrLemmatizer falls back
  * to the input); synonyms returns an EMPTY ARRAY when no synset
  * contains the token (synonyms.cpp: nullptr synset → empty row).
  *
  * Like the other session-registered data surfaces, the constant
  * dictionary NAME resolves at plan time and the CONTENT travels as a
  * plan literal (executor-local at any cluster size); kernels are
  * StaticInvoke with a bounded content-keyed memo for the parsed table.
  */
object NlpKernels {

  private val cacheMax = 64

  private val lemmaCache = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.HashMap[String, String]]()

  /** Parse "form<TAB>lemma" lines (blank lines / `#` comments skipped). */
  private def lemmaTable(blob: UTF8String): java.util.HashMap[String, String] = {
    val key = blob.toString
    if (lemmaCache.size > cacheMax) lemmaCache.clear()
    lemmaCache.computeIfAbsent(key, k => {
      val m = new java.util.HashMap[String, String]()
      k.split("\n").foreach { raw =>
        val line = raw.trim
        if (line.nonEmpty && !line.startsWith("#")) {
          val cut = line.indexOf('\t')
          val cut2 = if (cut >= 0) cut else line.indexOf(' ')
          if (cut2 > 0)
            m.put(line.substring(0, cut2).trim,
              line.substring(cut2 + 1).trim)
        }
      }
      m
    })
  }

  def lemmatizeDict(blob: UTF8String, word: UTF8String): UTF8String = {
    if (word == null) return null
    val hit = lemmaTable(blob).get(word.toString)
    if (hit == null) word else UTF8String.fromString(hit)
  }

  private val synCache = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.HashMap[String, String]]()

  /** Parse synset lines — each line one synset, words separated by
    * tabs/spaces/commas (the reference's `plain` extension file format:
    * one line per synset). token → the FIRST synset containing it. */
  private def synTable(blob: UTF8String): java.util.HashMap[String, String] = {
    val key = blob.toString
    if (synCache.size > cacheMax) synCache.clear()
    synCache.computeIfAbsent(key, k => {
      val m = new java.util.HashMap[String, String]()
      k.split("\n").foreach { raw =>
        val line = raw.trim
        if (line.nonEmpty && !line.startsWith("#")) {
          val words = line.split("[\\t, ]+").filter(_.nonEmpty)
          val joined = words.mkString("\u0001")
          words.foreach(w => if (!m.containsKey(w)) m.put(w, joined))
        }
      }
      m
    })
  }

  /** The synset containing `token`, U+0001-joined — or NULL on miss
    * (the registry wraps the NULL into the reference's empty array). */
  def synonymsDict(blob: UTF8String, token: UTF8String): UTF8String = {
    if (token == null) return null
    val hit = synTable(blob).get(token.toString)
    if (hit == null) null else UTF8String.fromString(hit)
  }
}

/** Session registry of NLP dictionaries (Lemmatizers /
  * SynonymsExtensions analog): programmatic register() or a NAMED
  * COLLECTION named `<name>` carrying `lines` (entry per line, `\n`
  * escapes accepted) or `path` (a dictionary file). */
object NlpDictionaries {

  private val lemmatizers =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val synonymsExts =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Wired by ChFunctionRegistry.install to the dialect's named
    * collections. */
  @volatile var collectionProvider: String => Option[Map[String, String]] =
    _ => None

  def registerLemmatizer(name: String, formToLemma: Seq[(String, String)]): Unit =
    lemmatizers.put(name.toLowerCase,
      formToLemma.map { case (f, l) => s"$f\t$l" }.mkString("\n"))

  def registerSynonyms(name: String, synsets: Seq[Seq[String]]): Unit =
    synonymsExts.put(name.toLowerCase,
      synsets.map(_.mkString("\t")).mkString("\n"))

  def dropLemmatizer(name: String): Unit = lemmatizers.remove(name.toLowerCase)
  def dropSynonyms(name: String): Unit = synonymsExts.remove(name.toLowerCase)

  private def fromCollection(name: String): Option[String] =
    collectionProvider(name).flatMap { kv =>
      kv.get("lines").map(_.replace("\\n", "\n"))
        .orElse(kv.get("path").map(p =>
          new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(p)), "UTF-8")))
    }

  /** Dictionary content for the constant-name argument; loud miss
    * (the reference throws on an unconfigured lemmatizer name too). */
  def lemmaBlob(name: String): String =
    Option(lemmatizers.get(name.toLowerCase)).orElse(fromCollection(name))
      .getOrElse(throw new IllegalArgumentException(
        s"Lemmatizer named '$name' is not registered (register a session " +
          "lemmatizer or a named collection with lines/path)"))

  def synBlob(name: String): String =
    Option(synonymsExts.get(name.toLowerCase)).orElse(fromCollection(name))
      .getOrElse(throw new IllegalArgumentException(
        s"Synonyms extension named '$name' is not registered"))
}
