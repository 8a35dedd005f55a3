"""Distributed connected components — near-dup CLUSTER resolution.

Every pair-producing dedup operator in this engine (``ngram_jaccard_pairs``,
``minhash_lsh_pairs``, ``simhash_pairs``, ``embedding_near_dup_pairs``)
stops at the EDGE LIST: (id_a, id_b, similarity). An actual corpus dedup
needs the transitive closure — if A≈B and B≈C, all three are one duplicate
cluster and exactly one representative survives. This module closes that
gap with a DataFrame-native connected-components operator.

Algorithm: iterative **min-label propagation with pointer jumping**.
Each node starts labeled with itself; every round each node takes the min
of (its label, its neighbors' labels), then shortcuts through its own
label's label (``l = label(label(x))`` — path halving). Neighbor
propagation alone needs O(diameter) rounds; the pointer-jumping step
collapses chains geometrically, giving O(log d) rounds on the chain-shaped
worst case near-dup graphs produce. Each round is two shuffles (one
neighbor groupBy-min, one self-join), all JVM-side; ``localCheckpoint``
truncates the iterative lineage so round N's plan does not replay rounds
1..N-1 (the classic iterative-Spark blowup).

At 100-TB scale: dup-cluster graphs are sparse (edges ≪ nodes) and
components are tiny (a news article syndicated 50×), so convergence is
2-4 rounds in practice; the per-round convergence count is one cheap agg
over the changed-flag column, not a collect of labels. The same loop shape
is what GraphFrames/GraphX run under the hood — implemented here directly
on DataFrames to stay dependency-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["connected_components", "dedup_clusters"]


class _CheckpointHandle:
    """Releasable handle to a ``localCheckpoint``'s persisted RDD blocks.

    ``DataFrame.unpersist()`` only clears CacheManager entries (``.cache()``/
    ``.persist()``); a localCheckpoint pins RDD-level blocks that the public
    DataFrame API cannot release. The handle tracks the checkpoint's RDD ids
    (diffed from ``getPersistentRDDs`` around the eager checkpoint call —
    sound while the driver thread is the only one creating checkpoints,
    which is this engine's execution model) and unpersists them via the
    JVM handles. Blocks also free on GC; the handle just makes it prompt.
    """

    def __init__(self, jsc, rdd_ids: set[int]):
        self._jsc = jsc
        self._ids = rdd_ids

    def unpersist(self, blocking: bool = False) -> None:
        m = self._jsc.getPersistentRDDs()
        for rid in self._ids:
            rdd = m.get(rid)
            if rdd is not None:
                rdd.unpersist(blocking)
        self._ids = set()


def _persistent_ids(jsc) -> set[int]:
    return {int(k) for k in jsc.getPersistentRDDs().keySet().toArray()}


def _sized_coalesce(df: DataFrame, n_rows: int, rows_per_part: int) -> DataFrame:
    """Merge a checkpointed table's partitions down to a size-appropriate
    count before an iterative loop re-scans it every round.

    Checkpoints inherit the upstream partitioning (usually the full
    shuffle width), and per-task fixed agg/shuffle setup costs make every
    iteration of a small-table loop overhead-bound — measured 1.3 s ->
    0.25 s on the pagerank contribution step at 1.9M edges when 64
    partitions merged to 4. ``coalesce`` is a narrow merge of the
    already-materialized blocks: no shuffle, no re-checkpoint, and a no-op
    whenever the table is large enough that the partition count is
    warranted (the row count scales partitions back up:
    ``ceil(rows / rows_per_part)`` clamped to the current count, so a
    10^9-row table on a wide cluster keeps its width).
    """
    cur = df.rdd.getNumPartitions()
    want = max(1, min(cur, -(-max(n_rows, 1) // rows_per_part)))
    return df.coalesce(want) if want < cur else df


def _spread(df: DataFrame, *key_cols: str) -> DataFrame:
    """Hash-repartition an under-split input up to cluster parallelism.

    The link extractions these operators consume often arrive as a narrow
    plan over a one-split scan (a single parquet file has one row group),
    which serializes the whole parse+aggregate funnel onto one core — the
    r6 profile showed the 20M-link build spending ~40 s in a ONE-task map
    stage. Hash partitioning on the payload columns (not round-robin)
    avoids the sort-before-repartition pass, is deterministic under task
    retry, and is a no-op whenever the input is already at or above
    ``defaultParallelism`` — a properly-split 100-TB scan never pays an
    extra exchange. Row placement cannot change any aggregate's output.
    """
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < parallelism:
        df = df.repartition(parallelism, *[F.col(c) for c in key_cols])
    return df


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    nodes: DataFrame | None = None,
    node_col: str = "doc_id",
    max_iter: int = 25,
    broadcast_max_nodes: int = 1_000_000,
    cache: list | None = None,
) -> DataFrame:
    """Resolve ``edges`` into components: returns (``node_col``,
    ``cluster_id``) where cluster_id = the component's minimum node id.

    ``nodes`` (optional, single-column) adds isolated nodes — documents
    with no dup pair — which come back as singleton clusters
    (cluster_id = own id); without it only nodes appearing in edges are
    labeled. Node ids must be non-null and totally ordered (longs here).

    Memory hygiene (the round-2 ``persist`` lesson): each round's
    ``localCheckpoint`` is eager, so the PREVIOUS round's blocks are
    unpersisted as soon as the new one materializes — at most one
    label-table copy is pinned at any time. The FINAL checkpoint backs the
    returned DataFrame and cannot be freed here; pass ``cache`` (a list)
    to receive it and ``unpersist()`` after consuming the result, else its
    blocks free on GC.
    """
    jsc = edges.sparkSession.sparkContext._jsc
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # pin the edge list ONCE: edges usually arrive as the tail of an
    # expensive pair-finding pipeline (shingle joins, LSH banding) and the
    # loop joins against them EVERY round — without this checkpoint each
    # iteration re-executes that whole upstream pipeline (measured 3x the
    # loop's own cost on the Jaccard-pairs bench)
    pre = _persistent_ids(jsc)
    sym = sym.localCheckpoint()
    sym_backing = _CheckpointHandle(jsc, _persistent_ids(jsc) - pre)
    # the loop re-scans sym every round; merge the checkpoint's inherited
    # shuffle-width partitioning down to the edge list's actual size
    # (per-task fixed costs dominate small iterative stages — see
    # _sized_coalesce)
    sym = _sized_coalesce(sym, sym.count(), 1_500_000)
    ids = sym.select(F.col("u").alias("id")).distinct()
    if nodes is not None:
        ids = ids.unionByName(
            nodes.select(F.col(node_col).alias("id"))
        ).distinct()
    # seed each label with min(id, min neighbor) instead of the identity:
    # star-shaped clusters (the typical near-dup shape — one hub, N spokes)
    # then converge on the FIRST loop round's no-change check instead of
    # needing a round to propagate and one more to confirm
    nbr0 = sym.groupBy(F.col("v").alias("id0")).agg(F.min("u").alias("n0"))
    seeded = (
        ids.join(nbr0, ids["id"] == nbr0["id0"], "left")
        .select("id", F.least(F.col("id"), F.coalesce("n0", "id")).alias("lbl"))
    )
    pre = _persistent_ids(jsc)
    labels = seeded.localCheckpoint()
    backing = _CheckpointHandle(jsc, _persistent_ids(jsc) - pre)
    n = labels.count()
    labels = _sized_coalesce(labels, n, 2_000_000)
    # while the label table provably fits (n counted above), broadcast it
    # and the per-round aggregates: the edge list then streams from its
    # checkpoint through broadcast hash joins — no per-round exchange of
    # sym, and the round's only shuffle is the map-side-combined
    # groupBy(v). Join strategy does not change the min-label recurrence:
    # labels are bit-identical either way. Beyond the threshold (the
    # 10^9-doc regime where a label table cannot broadcast) the
    # partitioned joins below are unchanged.
    small = n <= broadcast_max_nodes

    for _ in range(max_iter):
        l_side = F.broadcast(labels) if small else labels
        nbr_min = (
            sym.join(l_side, sym["u"] == labels["id"])
            .groupBy(F.col("v").alias("id2"))
            .agg(F.min("lbl").alias("nlbl"))
        )
        nm_side = F.broadcast(nbr_min) if small else nbr_min
        stepped = (
            labels.join(nm_side, labels["id"] == nbr_min["id2"], "left")
            .select(
                "id",
                F.least(F.col("lbl"), F.coalesce("nlbl", "lbl")).alias("lbl"),
                F.col("lbl").alias("_old"),
            )
        )
        # pointer jumping: follow my label to ITS label (path halving)
        ptr = stepped.select(F.col("id").alias("pid"), F.col("lbl").alias("plbl"))
        p_side = F.broadcast(ptr) if small else ptr
        jumped = (
            stepped.join(p_side, stepped["lbl"] == ptr["pid"], "left")
            .select(
                "id",
                F.least(F.col("lbl"), F.coalesce("plbl", "lbl")).alias("lbl"),
                "_old",
            )
        )
        new_labels = jumped.select("id", "lbl", (F.col("lbl") != F.col("_old")).alias("_chg"))
        pre = _persistent_ids(jsc)
        new_labels = new_labels.localCheckpoint()  # eager; truncates lineage
        new_backing = _CheckpointHandle(jsc, _persistent_ids(jsc) - pre)
        backing.unpersist()  # previous round's copy is dead now
        backing = new_backing
        changed = new_labels.agg(F.sum(F.col("_chg").cast("long"))).first()[0] or 0
        labels = new_labels.select("id", "lbl")
        if changed == 0:
            break

    sym_backing.unpersist()  # final labels are materialized; edges done
    if cache is not None:
        cache.append(backing)
    return labels.select(F.col("id").alias(node_col), F.col("lbl").alias("cluster_id"))


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
    cache: list | None = None,
) -> DataFrame:
    """Corpus-level dedup resolution: every document mapped to its duplicate
    cluster, with the keep/drop decision made (keep = the cluster's min id —
    deterministic representative selection, the standard web-dedup policy).

    Returns (``id_col``, cluster_id, keep boolean). Downstream:
    ``.filter("keep")`` is the deduplicated corpus; ``.filter("NOT keep")``
    is the removal manifest with full lineage to the surviving doc.

    ``pairs`` is taken as given — when a production chain consumes both the
    pair list AND this manifest, persist/checkpoint the pairs DF once and
    pass the same DF here so pair-finding (the dominant cost — shingle join
    or LSH banding) is never paid twice (bench row ``dedup_clusters_reuse``
    measures the reuse).
    """
    cc = connected_components(
        pairs, src=src, dst=dst, nodes=docs.select(id_col), node_col=id_col,
        cache=cache,
    )
    return cc.select(
        id_col, "cluster_id", (F.col(id_col) == F.col("cluster_id")).alias("keep")
    )
