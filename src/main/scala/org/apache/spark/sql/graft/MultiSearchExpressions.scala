package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level Aho-Corasick goto automaton over a FIXED needle set — the
  * single-scan structure behind the reference's Hyperscan literal dispatch
  * (src/Functions/MultiMatchAnyImpl.h, MultiSearchImpl.h): one pass over
  * the haystack regardless of needle count, vs the OR-of-contains chain
  * that rescans once per needle. Built once on the driver (the needle set
  * is a query literal), shipped to executors inside the codegen references.
  *
  * Transitions are flattened to a dense node×256 goto table during the BFS
  * fail-link pass, so the hot loop is two array loads per input byte with
  * no fail-chain walking. Terminal flags are propagated through fail links,
  * so `term(state)` answers "any needle ends here" directly.
  */
final class AhoCorasick(needles: Array[Array[Byte]]) extends Serializable {

  // contains("") is true for any haystack — short-circuit, keep the
  // automaton free of zero-length accept states.
  private val matchesEmpty: Boolean = needles.exists(_.isEmpty)

  private val (gotoTab: Array[Array[Int]], term: Array[Boolean]) = {
    val next = scala.collection.mutable.ArrayBuffer(Array.fill(256)(-1))
    val trm = scala.collection.mutable.ArrayBuffer(false)
    for (nd <- needles if nd.nonEmpty) {
      var cur = 0
      for (b <- nd) {
        val c = b & 0xff
        if (next(cur)(c) == -1) {
          next += Array.fill(256)(-1)
          trm += false
          next(cur)(c) = next.size - 1
        }
        cur = next(cur)(c)
      }
      trm(cur) = true
    }
    val fail = new Array[Int](next.size)
    val queue = scala.collection.mutable.Queue.empty[Int]
    var c = 0
    while (c < 256) {
      val v = next(0)(c)
      if (v == -1) next(0)(c) = 0 else { fail(v) = 0; queue += v }
      c += 1
    }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      if (trm(fail(u))) trm(u) = true
      var c2 = 0
      while (c2 < 256) {
        val v = next(u)(c2)
        if (v == -1) next(u)(c2) = next(fail(u))(c2)
        else { fail(v) = next(fail(u))(c2); queue += v }
        c2 += 1
      }
    }
    (next.toArray, trm.toArray)
  }

  def matches(bytes: Array[Byte]): Boolean = {
    if (matchesEmpty) return true
    var st = 0
    var i = 0
    while (i < bytes.length) {
      st = gotoTab(st)(bytes(i) & 0xff)
      if (term(st)) return true
      i += 1
    }
    false
  }
}

/** multiSearchAny over a literal needle set as ONE automaton pass per row
  * (reference: src/Functions/multiSearchAny.cpp — Hyperscan/AC dispatch).
  * Value-identical to `needles.map(contains).reduce(or)` (UTF-8 byte
  * semantics on both paths); the OR-chain stays as the oracle form and as
  * the plan for small needle sets, where per-needle `Contains` can still
  * push into the scan. */
case class MultiSearchAnyAC(child: Expression, needles: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_multi_search_any"

  @transient private lazy val ac =
    new AhoCorasick(needles.map(n => UTF8String.fromString(n).getBytes).toArray)

  override protected def nullSafeEval(s: Any): Any =
    ac.matches(s.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("graftMultiSearchAC", ac,
      classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $acRef.matches($s.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiSearchAnyAC =
    copy(child = newChild)
}
