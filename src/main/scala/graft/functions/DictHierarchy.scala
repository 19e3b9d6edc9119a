package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}

/** Hierarchical-dictionary kernels (reference
  * src/Dictionaries/HierarchyDictionariesUtils.h): the dictionary's
  * HIERARCHICAL attribute is a key→parent map; these walk it.
  * The plan-constant map literal is the SAME instance for every row, so
  * the child→parent (and inverted parent→children) indexes build once
  * per map and memoize — per-row work is the walk itself. */
object DictHierarchy {

  private val MaxDepth = 1000

  private val parentIdx =
    new java.util.WeakHashMap[AnyRef, Map[Long, Long]]()
  private val childIdx =
    new java.util.WeakHashMap[AnyRef, Map[Long, Array[Long]]]()

  private def parents(map: MapData): Map[Long, Long] =
    parentIdx.synchronized {
      Option(parentIdx.get(map)).getOrElse {
        val ks = map.keyArray().toLongArray()
        val vs = map.valueArray().toLongArray()
        val m = ks.zip(vs).toMap
        parentIdx.put(map, m)
        m
      }
    }

  private def children(map: MapData): Map[Long, Array[Long]] =
    childIdx.synchronized {
      Option(childIdx.get(map)).getOrElse {
        val ks = map.keyArray().toLongArray()
        val vs = map.valueArray().toLongArray()
        val m = ks.zip(vs).groupBy(_._2).map { case (p, kv) =>
          p -> kv.map(_._1).sorted
        }
        childIdx.put(map, m)
        m
      }
    }

  /** dictGetHierarchy: [key, parent, grandparent, …]. 0 is the
    * reference's hierarchical null sentinel — the walk stops BEFORE
    * emitting it (so key 0 itself yields an empty array, exactly the
    * reference loop in HierarchyDictionariesUtils.h getHierarchy). */
  def hierarchy(map: MapData, key: Long): ArrayData = {
    val p = parents(map)
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    var cur = key
    var depth = 0
    while (cur != 0 && depth < MaxDepth) {
      out += cur
      cur = p.getOrElse(cur, 0L)
      depth += 1
    }
    ArrayData.toArrayData(out.toArray)
  }

  /** dictIsIn: does walking up from `child` reach `ancestor`? */
  def isIn(map: MapData, child: Long, ancestor: Long): Boolean = {
    val p = parents(map)
    var cur = child
    var depth = 0
    while (cur != 0 && depth < MaxDepth) {
      if (cur == ancestor) return true
      cur = p.getOrElse(cur, 0L)
      depth += 1
    }
    false
  }

  /** dictGetChildren: first-level children of `key`. */
  def firstChildren(map: MapData, key: Long): ArrayData =
    ArrayData.toArrayData(
      children(map).getOrElse(key, Array.empty[Long]))

  /** dictGetDescendants: level = 0 → ALL descendants (BFS order);
    * level = k → descendants at exactly that depth
    * (HierarchyDictionariesUtils.h GetAllDescendantsStrategy /
    * GetDescendantsAtSpecificLevelStrategy). */
  def descendants(map: MapData, key: Long, level: Int): ArrayData = {
    val c = children(map)
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    var frontier: Seq[Long] = c.getOrElse(key, Array.empty[Long]).toSeq
    var depth = 1
    val seen = scala.collection.mutable.Set[Long](key)
    while (frontier.nonEmpty && depth <= MaxDepth) {
      val fresh = frontier.filterNot(seen.contains)
      fresh.foreach(seen.add)
      if (level == 0) out ++= fresh
      else if (depth == level) { out ++= fresh; frontier = Seq.empty }
      if (depth != level || level == 0)
        frontier = fresh.flatMap(k => c.getOrElse(k, Array.empty[Long]).toSeq)
      depth += 1
    }
    ArrayData.toArrayData(out.toArray)
  }
}
