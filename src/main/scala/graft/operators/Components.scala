package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by min-label propagation, the cluster
  * step of a near-dup pipeline: pair detection (simhash/minhash/Jaccard)
  * yields edges, this collapses them into per-document cluster labels so
  * dedup keeps one canonical representative per cluster.
  *
  * Scale design: each round pushes every node's label to its neighbors
  * and unions in the own-label rows so one map-side-combined min
  * aggregation both propagates and detects change, then compresses paths
  * by re-pointing each node at its label's label (pointer doubling, so
  * chain-shaped components converge in O(log diameter) rounds instead of
  * O(diameter); near-dup graphs are mostly dense, but the
  * synthetic-corpus near-dup graph showed exactly the chain-y tail that
  * needs it) — three exchanges per round. Every round ends in an EAGER
  * localCheckpoint: an iterative frame that merely caches keeps its whole
  * logical plan, and since each round references the previous frame
  * several times the plan tree grows geometrically — 15 rounds of that
  * OOMed an 8 GB driver on a 50-document corpus before any executor did
  * real work. (A persist-instead-of-checkpoint variant with a 3-round
  * checkpoint window benched consistently SLOWER at sf0.1 — 5.2 s vs
  * 3.2 s — so the per-round checkpoint stays.) The
  * checkpoint truncates lineage to the materialized blocks, making plan
  * size (and driver memory) constant per round. On a multi-node cluster
  * where executor loss mid-algorithm must be survivable, set
  * spark.graft.components.reliableCheckpoint=true (plus a
  * SparkContext.setCheckpointDir) and every round checkpoints to the
  * reliable store instead of executor-local blocks; the algorithm is
  * unchanged.
  *
  * Convergence detection rides the propagation step only: when no node saw
  * a smaller neighbor label, every edge's endpoints already carry equal
  * labels (the condition is symmetric), so each component is
  * constant-labeled and compression is a no-op — stopping there is exact.
  */
object Components {

  /** Edges (undirected, any orientation, self-loops/dups tolerated) →
    * one row per distinct node: (node, cluster_id = min node id of its
    * component). Nodes absent from `edges` are absent from the result —
    * callers left-join and coalesce to self for singletons. */
  def assign(edges: DataFrame, maxIters: Int = 50): DataFrame = {
    // cache the directed edges first: the bidirectional union reads them
    // twice, and when the caller's `edges` is itself a join pipeline
    // (simhash band collisions, LSH candidates) an uncached union would
    // re-run that pipeline once per direction
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
      .cache()
    val m = e.count()
    // pinned hash partitioning on src, cached ONCE: the edge list is the
    // largest frame in the algorithm and every round joins it on src — a
    // plain cache would still re-exchange it per round, while the explicit
    // repartition makes the cached blocks satisfy the join's distribution
    // so only the (shrinking) label frame moves each round. The width is
    // sized to the graph (~2M edges ≈ 32 MB per partition), capped at the
    // session's configured shuffle width: a near-dup graph of tens of
    // thousands of edges runs its rounds on a couple of partitions (each
    // round's cost is task-scheduling latency, not compute), while a
    // trillion-edge graph uses everything the cluster is configured for.
    // some managed runtimes set shuffle.partitions to a non-numeric value
    // (e.g. "auto"); the sizing heuristic degrades to defaultParallelism
    // there instead of crashing before any work
    val confParts = scala.util.Try(
      e.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
      .getOrElse(e.sparkSession.sparkContext.defaultParallelism)
    val parts = math.max(1L,
      math.min(confParts.toLong, (2 * m + 1999999) / 2000000)).toInt
    // per-round lineage pin: executor-local blocks by default (fastest),
    // or the reliable checkpoint store when the caller opts in for
    // executor-loss survivability on a real cluster
    val reliable = e.sparkSession.conf
      .getOption("spark.graft.components.reliableCheckpoint")
      .exists(_.equalsIgnoreCase("true")) &&
      e.sparkSession.sparkContext.getCheckpointDir.isDefined
    // reliable mode is a managed parquet round-trip rather than
    // df.checkpoint: RDD checkpoint files are only reclaimed by the
    // GC-driven cleaner (off by default), so a 50-round run would leave
    // O(rounds × |nodes|) dead files in the store. Here each round's
    // snapshot is deleted as soon as the next one is on disk — the store
    // holds at most two live snapshots during a round and exactly one
    // (the result the caller reads) after the loop.
    val ckRoot = e.sparkSession.sparkContext.getCheckpointDir
    val runId = java.util.UUID.randomUUID().toString.take(8)
    var prevReliable: Option[org.apache.hadoop.fs.Path] = None
    var round = 0
    def pin(df: DataFrame): DataFrame =
      if (reliable) {
        val spark = df.sparkSession
        val dir = new org.apache.hadoop.fs.Path(ckRoot.get, s"graft-cc-$runId-r$round")
        round += 1
        df.write.mode("overwrite").parquet(dir.toString)
        prevReliable.foreach { p =>
          p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
        }
        prevReliable = Some(dir)
        spark.read.parquet(dir.toString)
      } else df.localCheckpoint(true)
    val bidir = e
      .union(e.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(parts, col("src"))
      .cache()
    // r17: the loop's width is pinned per exchange with explicit
    // repartition(parts, key) instead of mutating the session-global
    // spark.sql.shuffle.partitions (the r16 form): session conf is shared
    // across threads, so a concurrent query planned during a CC loop
    // would silently plan at the graph's width. The explicit form pins
    // exactly the exchange that matters — the label frame's join side,
    // which must co-partition with bidir's cached hash(src, parts)
    // blocks (a width mismatch would re-exchange the cached edge list
    // every round). The aggregation exchanges keep the session width and
    // their map-side partial aggregation; AQE coalescing shrinks their
    // near-empty reduce tasks on a small graph, and on a corpus-sized
    // graph the session width is the right width anyway.
    // r16: the seed aggregation is NOT separately checkpointed — round
    // 0's pin materializes seed + first propagation in one job (one less
    // checkpoint per run; the seed subtree appears twice in round 0's
    // plan but ends in an exchange, which ReusedExchange dedupes). Its
    // output partitioning, hash(src, parts), matches bidir's, so the
    // round-0 join adds no exchange either. e's directed cache is
    // released after the FIRST pin — by then bidir's cache (e's last
    // reader) is materialized.
    var comp = bidir.groupBy(col("src"))
      .agg(min(col("dst")).as("__nbr"))
      .select(col("src").as("node"),
        least(col("__nbr"), col("src")).as("cluster_id"))
    var eReleased = false
    var converged = false
    var iters = 0
    while (!converged && iters < maxIters) {
      // propagate: every node's label flows to its neighbors; the
      // neighbor-label rows and each node's own-label row union into ONE
      // min aggregation. The own row carries the previous label in __old
      // (each node has exactly one, so max() recovers it), which makes
      // change detection a per-row comparison instead of a join-back —
      // the round runs 3 exchanges (comp→edge partitioning, the node agg,
      // the compress probe) where the join+agg+join form ran 6.
      // Every bidir node appears as src (the union is symmetric), so comp
      // covers all of cand's nodes and the union loses nobody.
      val cand = comp.repartition(parts, col("node"))
        .join(bidir, col("node") === col("src"))
        .select(col("dst").as("node"), col("cluster_id"),
          lit(null).cast("long").as("__old"))
      val own = comp.select(col("node"), col("cluster_id"),
        col("cluster_id").as("__old"))
      val stepped = cand.union(own)
        .groupBy(col("node"))
        .agg(min(col("cluster_id")).as("cluster_id"), max(col("__old")).as("__old"))
        .select(col("node"), col("cluster_id"),
          (col("cluster_id") < col("__old")).as("__changed"))
      // compress: node → label(label(node)); labels only shrink and always
      // name a node of the same component, so this is safe and halves the
      // remaining chain depth
      val flat = stepped.as("x")
        .join(stepped.select(col("node").as("__ln"),
          col("cluster_id").as("__lc")).as("y"),
          col("x.cluster_id") === col("y.__ln"), "left_outer")
        .select(col("x.node").as("node"),
          coalesce(col("__lc"), col("x.cluster_id")).as("cluster_id"),
          col("x.__changed").as("__changed"))
      // change detection rides the SAME job that materializes the round:
      // an Observation on the checkpoint action counts changed nodes as
      // the rows stream past, replacing the separate filter/limit probe
      // job each round used to pay (observe is exact for batch actions)
      val t0 = System.nanoTime()
      val obs = new org.apache.spark.sql.Observation(s"cc-changed-$iters")
      val next = pin(flat.observe(obs,
        sum(when(col("__changed"), 1L).otherwise(0L)).as("n_changed")))
      val nChanged = obs.get("n_changed") match {
        case null => 0L  // empty frame: no rows, no changes
        case v    => v.asInstanceOf[Long]
      }
      if (!eReleased) {
        // bidir's cache materialized with the first pin — drop the
        // directed copy instead of holding ~1.5x the edge set all loop
        e.unpersist(blocking = false)
        eReleased = true
      }
      converged = nChanged == 0L
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        println(f"[cc] round=$iters%d pin=${(System.nanoTime() - t0) / 1e9}%.3f changed=$nChanged%d parts=$parts%d edges=$m%d")
      comp = next.drop("__changed")
      iters += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIters rounds")
    bidir.unpersist(blocking = false)
    comp
  }
}
