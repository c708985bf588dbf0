package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative link analysis over join-derived graphs — the web-graph
  * centrality signal the CommonCrawl curation stacks (OPIC/Harmonic/
  * PageRank rankings in CC's own index; quality priors in corpus
  * selection) compute before any text filter runs.
  *
  * The reference demo has no graph operator; this is part of the
  * training-data widening surface (SURVEY §2). The graph here is the
  * bipartite customer↔supplier order graph (who trades with whom, edge
  * weight = lineitem count), the TPC-H stand-in for a hyperlink graph.
  *
  * Scale shape (the Pregel loop, declaratively): the edge list with
  * per-source total weights is built ONCE, cached, and pre-partitioned
  * by `src`; each of the fixed `iters` rounds is then
  *
  *   ranks ⨝ edges on src  →  groupBy dst sum  →  left join node list
  *
  * so the per-iteration cost is one rank-table shuffle onto the cached
  * edge partitioning plus one aggregation — no collect, no window, node
  * and edge state stays distributed (nodes are data-sized: ~custkeys +
  * suppkeys). On 1000 executors this is exactly GraphX's
  * aggregateMessages layout without the RDD detour.
  *
  * Cross-engine exactness: ranks live in 1e-12 units as BIGINT. Each
  * hop contribution is `(r * w) div W` (all positive, so Spark's
  * truncating `div` == DuckDB's flooring `//`), the damping update is
  * `(15*r0 + 85*inflow) div 100`, and the per-node inflow sum is exact
  * BIGINT — no float enters the recurrence, so a 5-iteration unrolled
  * CTE replays it bit-for-bit. Bounds: total mass ≤ 1e12, edge weight
  * ≤ corpus rows, so `r*w` stays < 2^63 up to ~4.6M lineitems per
  * (cust,supp) pair — far past any tested sf; a 100 TB run would drop
  * the quantization to 1e-9 units.
  */
object Graph {

  /** Damped PageRank (d=0.85, 5 iterations) over the undirected
    * customer↔supplier order graph; top 20 nodes by final rank
    * (ties → smaller node id), rank exposed exactly in 1e-12 units. */
  def pageRank(spark: SparkSession, dir: String, iters: Int = 5): DataFrame = {
    val t = graft.Tables(spark, dir)
    // weighted bipartite edges: one lineitem = one unit of weight between
    // the order's customer and the line's supplier. Node ids interleave
    // the two key spaces (customer 2k, supplier 2k+1) so one BIGINT
    // column carries both sides.
    val pairs = t.lineitem.select("l_orderkey", "l_suppkey")
      .join(t.orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .agg(count(lit(1)).as("w"))
    // ONE pair scan: each (c,s,w) explodes into both directions (a
    // union of two pairs-selects re-ran the whole lineitem⨝orders build
    // per branch — the two sides' differing null filters defeat exchange
    // reuse; measured ~2× the build cost at sf5), and ONE exchange by
    // `src` then serves the degree aggregate, the degree join's
    // co-location AND the cached layout the iteration loop joins against.
    val edges0 = pairs
      .select(explode(array(
          struct(col("c").as("src"), col("s").as("dst")),
          struct(col("s").as("src"), col("c").as("dst")))).as("e"),
        col("w"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"), col("w"))
      .repartition(col("src"))
    // no exchange: edges0 is already hash-partitioned by src, so the
    // degree agg and the join below both reuse that partitioning; the
    // shuffle_hash hint builds from the node-sized degree side instead
    // of sort-merge-sorting the edge stream.
    val deg = edges0.groupBy("src").agg(sum("w").as("wtot"))
    // built once, partitioned by the per-iteration join key, cached: the
    // loop below re-reads this frame `iters` times and must never redo
    // the lineitem⨝orders build or re-exchange the (big) edge side.
    val edges = graft.GraftSession.trackCache(
      edges0.join(deg.hint("shuffle_hash"), "src"))
    val nodes = graft.GraftSession.trackCache(edges.select("src").distinct())
    // scalar |V| (node-count, not node rows) — sizes the teleport term
    val v = nodes.count()
    val r0 = 1000000000000L / v
    var ranks = nodes.select(col("src").as("node"), lit(r0).as("r"))
    for (_ <- 1 to iters) {
      // shuffle_hash on the rank side: ranks is the node table (small
      // next to edges), so each partition builds a hash map of its rank
      // slice and STREAMS the cached edge partition — the default
      // sort-merge plan re-sorted the (big) edge side every iteration,
      // measured 42 GB of sort spill at sf5
      val inflow = edges.join(ranks.hint("shuffle_hash"), edges("src") === ranks("node"))
        .select(col("dst"), expr("(r * w) div wtot").as("contrib"))
        .groupBy("dst").agg(sum("contrib").as("inflow"))
      // no node left-join: the explode above emits BOTH directions of
      // every pair, so each node occurs as a dst of some positive-weight
      // edge and (ranks staying > 0 by induction: r0 > 0 and the damping
      // floor is 15·r0 div 100) the inflow aggregate covers exactly the
      // node set — re-joining the node list would add an 800k×800k
      // sort-merge join per iteration for rows that cannot exist. The
      // DuckDB oracle keeps the LEFT JOIN form; equality is the proof.
      ranks = inflow.select(col("dst").as("node"),
        expr(s"(15 * ${r0}L + 85 * inflow) div 100").as("r"))
    }
    ranks
      .orderBy(col("r").desc, col("node"))
      .limit(20)
      .select(
        when(col("node") % 2 === 0, lit("customer")).otherwise(lit("supplier"))
          .as("node_type"),
        expr("node div 2").as("node_key"),
        col("r").as("rank_q12"))
  }

  /** Converged star labeling (node, root) of the repeat-trade graph —
    * the Large-Star/Small-Star contraction of Kiveris et al., "Connected
    * Components in MapReduce and Beyond" (SoCC 2014), the published
    * web-graph-scale CC algorithm. Edge rule: customer↔supplier pairs
    * with ≥ 2 lineitems (one-off trades are noise, repeat business is
    * structure); node ids interleave the key spaces as in [[pageRank]].
    *
    * Each alternation is one neighborhood-min aggregate + one
    * co-partitioned join + one distinct over a NON-INCREASING edge set —
    * never pair-space, never a collect, and the needed round count is
    * O(log n) worst-case but diameter-driven in practice, so `rounds` = 8
    * is fixed (the oracle replays the identical unrolled recurrence;
    * Round12Spec asserts round 8 is a fixed point on the fixtures AND
    * that the labeling equals a driver-side union-find). Measured
    * convergence on the supplier-hub trade graph: 3 rounds at sf0.001,
    * 4-5 at sf0.01 through sf5 — the hub structure keeps the effective
    * diameter tiny, so 8 carries ≥3 rounds of slack at every tested
    * scale.
    *
    * Exposed for the spec; [[components]] is the public aggregate. */
  private[graft] def componentMembers(spark: SparkSession, dir: String,
      rounds: Int = 8): DataFrame = {
    val t = graft.Tables(spark, dir)
    val pairs = t.lineitem.select("l_orderkey", "l_suppkey")
      .join(t.orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .agg(count(lit(1)).as("w"))
      .where(col("w") >= 2)
    // canonical orientation: u = the larger endpoint, v = the smaller
    var e = pairs.select(greatest(col("c"), col("s")).as("u"),
      least(col("c"), col("s")).as("v"))
    for (_ <- 1 to rounds) {
      // lineage cut, load-bearing twice over: each alternation references
      // its input ~8× (sym explode ×2, two agg self-joins, the union), so
      // an uncut plan grows 8^round — the analyzer's DeduplicateRelations
      // pass alone is exponential (measured: the 8-round plan never
      // finishes analysis). Eager localCheckpoint materializes the
      // (non-increasing, node-bounded) edge set once per round and starts
      // the next round from a leaf — the same per-iteration checkpoint
      // GraphFrames ships for this exact algorithm; a multi-executor
      // deployment would flip to reliable `checkpoint` on shared storage.
      e = e.localCheckpoint()
      // LARGE-STAR over the symmetric closure: every node u links its
      // STRICTLY LARGER neighbors to m = min(Γ(u) ∪ {u}); output stays
      // canonical (m <= u < emitted source).
      val sym = e.select(explode(array(
          struct(col("u"), col("v")),
          struct(col("v").as("u"), col("u").as("v")))).as("p"))
        .select(col("p.u").as("u"), col("p.v").as("v"))
      val lsMin = sym.groupBy("u").agg(least(min(col("v")), col("u")).as("m"))
      val ls = sym.join(lsMin, "u").where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")).distinct()
      // SMALL-STAR on the canonical orientation: every node u links its
      // smaller neighborhood (and itself) to that neighborhood's min
      val ssMin = ls.groupBy("u").agg(min(col("v")).as("m"))
      val j = ls.join(ssMin, "u")
      e = j.select(col("u"), col("m").as("v"))
        .unionByName(j.where(col("v") =!= col("m"))
          .select(col("v").as("u"), col("m").as("v")))
        .distinct()
    }
    // converged star edges point every non-root at its component's min
    // node; roots occur only on the v side — the (v, v) union row makes
    // each root a member of its own component.
    e.select(col("u").as("node"), col("v").as("root"))
      .unionByName(e.select(col("v").as("node"), col("v").as("root")))
      .distinct()
  }

  /** Connected components (`q_components`): top-20 repeat-trade
    * communities by size (ties → smaller root), with the
    * customer/supplier member split. See [[componentMembers]]. */
  def components(spark: SparkSession, dir: String): DataFrame =
    componentMembers(spark, dir)
      .groupBy("root")
      .agg(count(lit(1)).as("n_nodes"),
        sum(when(col("node") % 2 === 0, 1L).otherwise(0L)).as("n_customers"),
        sum(when(col("node") % 2 === 1, 1L).otherwise(0L)).as("n_suppliers"))
      .orderBy(col("n_nodes").desc, col("root"))
      .limit(20)
      .select(
        when(col("root") % 2 === 0, lit("customer")).otherwise(lit("supplier"))
          .as("root_type"),
        expr("root div 2").as("root_key"),
        col("n_nodes"), col("n_customers"), col("n_suppliers"))
}
