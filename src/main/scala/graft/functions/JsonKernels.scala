package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.unsafe.types.UTF8String

/** JSON merge kernels (src/Functions/jsonMergePatch.cpp — RFC 7386).
  * Jackson (on Spark's classpath) preserves object-key insertion order, so
  * output key order matches the reference's rapidjson behavior (target
  * keys first, new patch keys appended) and DuckDB's json_merge_patch —
  * verified byte-identical on the oracle battery. */
object JsonKernels {

  private val mapper = new ObjectMapper()

  /** RFC 7386: if patch is not an object, the patch replaces the target;
    * else null patch values delete keys, objects merge recursively. */
  def mergePatch(a: UTF8String, b: UTF8String): UTF8String = {
    val target = mapper.readTree(a.toString)
    val patch = mapper.readTree(b.toString)
    UTF8String.fromString(mapper.writeValueAsString(merge(target, patch)))
  }

  private def merge(target: JsonNode, patch: JsonNode): JsonNode = {
    if (!patch.isObject) return patch
    val out: ObjectNode =
      if (target != null && target.isObject) target.deepCopy[ObjectNode]()
      else mapper.createObjectNode()
    val it = patch.fields()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue.isNull) out.remove(e.getKey)
      else out.set[JsonNode](e.getKey, merge(out.get(e.getKey), e.getValue))
    }
    out
  }
}
