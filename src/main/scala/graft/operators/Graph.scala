package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed graph analytics over pair relations.
  *
  * Complements [[Dedup.connectedComponents]] (membership) with an
  * importance measure: PageRank picks the best CANONICAL document inside a
  * near-duplicate cluster (the variant most other variants resemble), where
  * CC alone can only pick an arbitrary one.
  *
  * Scale shape per iteration: one shuffle — contributions grouped by
  * destination — joined against the static degree relation; ranks and
  * degrees are co-partitioned on the node key, so AQE keeps the join local.
  * Lineage is truncated with a LAZY localCheckpoint per iteration
  * (10 unrolled joins would otherwise stack into one exponential Catalyst
  * plan — same lesson as the CC loop; lazy because the plan is severed
  * either way, while the blocks materialize transitively inside the final
  * action instead of as 10 separate jobs).
  *
  * Determinism: ranks accumulate in DECIMAL(20,18). Decimal addition is
  * exact and order-independent (unlike float sums, whose grouping varies
  * with partitioning), and decimal division is deterministic HALF_UP, so
  * every run — any partitioning, any executor count — yields bit-identical
  * ranks. The driver's rows-only check plus GraphSpec's closed-form and
  * determinism tests cover what a cross-engine oracle can't (DuckDB's
  * decimal division scale rules differ, so the same SQL there would NOT be
  * bit-identical — documented, not hidden).
  */
object Graph {

  // Ranks live in [0, 1], so 2 integer digits suffice — and the headroom
  // matters: at (38,18) a rank×damping product overflows precision 38 and
  // Spark truncates the result scale to 6 (1e-6 drift per iteration,
  // measured); at (20,18) products stay inside 38 digits with scale ≥ 33,
  // so iteration error is ~1e-30 and the HALF_UP re-cast to (20,18) is the
  // only rounding.
  private val RankType = "decimal(20,18)"

  /** Undirected PageRank on a pair relation (columns = two node ids).
    * Returns (node, rank) with rank as DECIMAL(20,18) cast to double after
    * a 1e-12 round (display only — iteration state never rounds). */
  def pageRank(pairs: DataFrame, damping: Double = 0.85, iterations: Int = 10): DataFrame = {
    val edges = pairs.toDF("a", "b")
    val sym = edges.unionByName(edges.select(col("b").as("a"), col("a").as("b")))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint()
    val nodes = sym.select(col("a").as("node")).distinct().localCheckpoint()
    val n = nodes.count()
    require(n > 0, "pageRank needs at least one edge")

    // Degree is static — fold it into the edge relation ONCE so each
    // iteration is a single join (ranks ⋈ weighted edges) + one aggregation
    // instead of two joins; over 10 iterations that drops 10 join stages
    // from the run.
    val deg = sym.groupBy(col("a").as("node")).agg(count(lit(1)).as("deg"))
    val weightedEdges = sym.join(deg.withColumnRenamed("node", "a"), "a")
      .select(col("a"), col("b"), col("deg")).localCheckpoint()
    val d = lit(damping).cast(RankType)
    val teleport = (lit(1.0).cast(RankType) - d) / n

    var ranks = nodes.withColumn("rank", (lit(1.0).cast(RankType) / n).cast(RankType))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      val contribs = weightedEdges
        .join(ranks.withColumnRenamed("node", "a"), "a")
        .select(col("b").as("node"), (col("rank") / col("deg")).cast(RankType).as("c"))
        .groupBy("node").agg(sum("c").as("inflow"))
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (teleport + d * coalesce(col("inflow"), lit(0).cast(RankType))).cast(RankType).as("rank"))
        // LAZY: the Catalyst plan is severed per iteration either way (the
        // checkpoint is a LogicalRDD, so analysis cost stays O(1) per
        // round); blocks materialize transitively inside the final action
        // — the 10 per-iteration checkpoint jobs collapse into one
        .localCheckpoint(false)
    }
    ranks.select(col("node"), round(col("rank"), 12).cast("double").as("rank"))
  }

  /** PageRank over the sampled Jaccard near-dup graph: rank within each
    * duplicate cluster = how central a variant is. Deterministic input
    * (dd3's exact sampled pairs), deterministic iteration ⇒ stable row
    * count AND values for the driver's rows-only check. */
  def neardupPageRank(s: SparkSession, dir: String): DataFrame =
    pageRank(Dedup.jaccardPairs(s, dir).select("id_a", "id_b"))
      .orderBy("node")

  /** Per-node triangle counts on an ordered pair relation (a < b on every
    * edge, as dedup pair outputs guarantee). Wedge enumeration: join edges
    * on the shared middle endpoint — the a<b<c orientation means each
    * triangle is generated exactly once — then a semi-join closes the
    * (a, c) side. Two equi-join shuffles on node keys, never all-pairs;
    * wedge volume is Σ deg², which upstream LSH bucket caps already bound
    * (the same skew that would blow up here would have blown up the
    * candidate join that produced the edges). The edge relation is
    * materialized once and reused by all three join branches. */
  def triangleCounts(pairs: DataFrame): DataFrame = {
    val e = pairs.toDF("a", "b").localCheckpoint()
    val wedge = e.join(
      e.select(col("a").as("b"), col("b").as("c")), "b")
    val tri = wedge.join(
      e.select(col("a").as("a3"), col("b").as("c3")),
      col("a") === col("a3") && col("c") === col("c3"), "left_semi")
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node")
      .agg(count(lit(1)).as("n_triangles"))
      .orderBy("node")
  }

  /** Triangle counts over the near-dup graph: triangles are the
    * transitivity evidence that a candidate pair group really is ONE
    * duplicate cluster (A≈B, B≈C, A≈C) rather than a chain of borderline
    * matches. Exact sampled input (dd3) ⇒ full DuckDB oracle. */
  def neardupTriangles(s: SparkSession, dir: String): DataFrame =
    triangleCounts(Dedup.jaccardPairs(s, dir).select("id_a", "id_b"))
}
