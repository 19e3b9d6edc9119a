package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** r8 ADVICE pin: the JSONObjectEachRow value scanner tracks bracket
  * depth, so nested array/object values (and strings inside them
  * containing commas/braces) scan whole instead of splitting at the
  * first inner separator. */
class JsonObjectScannerSpec extends AnyFunSuite {

  test("nested arrays/objects and tricky strings scan as single values") {
    val kv = ChTextFormats.parseJsonObject(
      """{"a": [1, 2, 3], "b": {"x": 1, "y": [4, 5]}, """ +
        """"c": "plain, with } and ]", "d": 7, "e": ["s,t", "u}v"]}""")
    assert(kv("a") == ("[1, 2, 3]", false))
    assert(kv("b") == ("""{"x": 1, "y": [4, 5]}""", false))
    assert(kv("c") == ("plain, with } and ]", true))
    assert(kv("d") == ("7", false))
    assert(kv("e") == ("""["s,t", "u}v"]""", false))
  }

  test("flat scalar rows still parse exactly as before") {
    val kv = ChTextFormats.parseJsonObject(
      """{"k": 1, "name": "A, B", "f": 2.5, "n": null}""")
    assert(kv("k") == ("1", false))
    assert(kv("name") == ("A, B", true))
    assert(kv("f") == ("2.5", false))
    assert(kv("n") == ("null", false))
  }
}
