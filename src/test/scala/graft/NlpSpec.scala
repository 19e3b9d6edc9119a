package graft

/** lemmatize / synonyms over session-registered dictionaries (round-13;
  * reference src/Functions/{lemmatize,synonyms}.cpp — closes two names
  * of the NLP-models audit residue with the documented
  * session-dictionary deviation). */
class NlpSpec extends SparkFunSuite {

  private def ch(s: String) = graft.sql.ClickHouseSql.sql(spark, s)
  private val dicts = graft.functions.NlpDictionaries

  test("lemmatize: dictionary hit maps, miss passes the word through, " +
      "unregistered name is loud") {
    dicts.registerLemmatizer("nlp_spec_en", Seq(
      "wolves" -> "wolf", "ran" -> "run", "better" -> "good"))
    try {
      val r = ch("SELECT lemmatize('nlp_spec_en', w) AS l FROM (" +
        "SELECT explode(array('wolves', 'ran', 'spark', 'better')) AS w)")
        .collect().map(_.getString(0)).toSeq
      assert(r == Seq("wolf", "run", "spark", "good"))
      val e = intercept[Exception](
        ch("SELECT lemmatize('nlp_spec_nope', 'x')").collect())
      assert(e.getMessage.contains("not registered"))
    } finally dicts.dropLemmatizer("nlp_spec_en")
  }

  test("synonyms: the synset containing the token, empty array on miss; " +
      "named-collection registration works too") {
    dicts.registerSynonyms("nlp_spec_syn", Seq(
      Seq("important", "big", "critical"), Seq("happy", "glad")))
    try {
      val hit = ch("SELECT synonyms('nlp_spec_syn', 'big') AS s")
        .collect().head.getSeq[String](0)
      assert(hit == Seq("important", "big", "critical"))
      val miss = ch("SELECT synonyms('nlp_spec_syn', 'zebra') AS s")
        .collect().head.getSeq[String](0)
      assert(miss.isEmpty)
    } finally dicts.dropSynonyms("nlp_spec_syn")
    // named collection lane (the reference's config-file analog)
    ch("DROP NAMED COLLECTION IF EXISTS nlp_spec_coll")
    ch("CREATE NAMED COLLECTION nlp_spec_coll AS " +
      "lines = 'cat feline\\ndog canine'")
    try {
      assert(ch("SELECT lemmatize('nlp_spec_coll', 'cat') AS l")
        .collect().head.getString(0) == "feline")
      assert(ch("SELECT synonyms('nlp_spec_coll', 'dog') AS s")
        .collect().head.getSeq[String](0) == Seq("dog", "canine"))
    } finally ch("DROP NAMED COLLECTION IF EXISTS nlp_spec_coll")
  }
}
