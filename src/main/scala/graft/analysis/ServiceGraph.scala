package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Service-dependency graph analytics over flattened span frames
  * (reference surface: the span tree per trace, `traceframe.py:429-433`
  * parentage; the graph view is an engine extension).
  *
  * Scale shape: the edge list aggregates down to (src service, dst
  * service, weight) — #services²-bounded regardless of span volume; the
  * only corpus-scale work is the child→parent self-join, an equi-join on
  * (traceID, spanID). PageRank then iterates DRIVER-SIDE on the
  * collected bounded edge table — the same legitimate bounded-state
  * pattern as the k×d centroid table in k-means (a service catalog is
  * thousands of rows at Google scale, not billions); no corpus data is
  * ever collected.
  */
object ServiceGraph {

  /** (src, dst, calls) edge weights: parent-span service → child-span
    * service, one corpus-scale equi-join, #services²-bounded output. */
  def dependencyEdges(spans: DataFrame): DataFrame = {
    val child = spans.filter(col("parent") =!= "")
      .select(col("traceID"), col("parent").as("spanID"),
        col("service").as("dst"))
    val parent = spans.select(col("traceID"), col("spanID"),
      col("service").as("src"))
    child.join(parent, Seq("traceID", "spanID"))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("calls"))
  }

  /** Weighted PageRank with damping `d` over the bounded service graph.
    * Dangling mass (services with no out-edges) redistributes uniformly
    * each round — ranks sum to 1 every iteration. Returns
    * (service, rank). */
  def pageRank(edges: DataFrame, iters: Int = 10, d: Double = 0.85)
      : DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val ed = edges.select(col("src"), col("dst"),
        col("calls").cast("double").as("w"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val nodes = (ed.map(_._1) ++ ed.map(_._2)).distinct.sorted
    val n = nodes.length
    require(n > 0, "empty service graph")
    val outW = ed.groupBy(_._1).map { case (s, es) =>
      s -> es.map(_._3).sum }
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dangling = nodes.filter(s => !outW.contains(s))
        .map(rank).sum
      val recv = ed.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _, w) => rank(s) * w / outW(s) }.sum
      }
      rank = nodes.map(s => s ->
        ((1 - d) / n + d * (recv.getOrElse(s, 0.0) + dangling / n))).toMap
    }
    nodes.map(s => (s, rank(s))).toSeq.toDF("service", "rank")
  }
}
