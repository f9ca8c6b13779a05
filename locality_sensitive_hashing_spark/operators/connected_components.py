"""Iterative DataFrame connected components (O21): min-label propagation.

The reference folded verified pairs into disjoint sets with an in-process
union-find (REF? "dup sets", UNVERIFIED -- empty mount; MMDS section 3.4
practice). Union-find is inherently sequential, so the Spark-native
equivalent is hash-partitioned min-label propagation (BASELINE.json
"iterative DataFrame connected-components (hash-partitioned label
propagation)"): every node starts labeled with itself; each round every
node takes the min label among itself and its neighbors; convergence in
O(diameter) rounds. Duplicate clusters have tiny diameters (chains of
near-dups), so rounds stay single-digit; an iteration cap + convergence
assertion guard pathological graphs.

The fixed point labels every node with the minimum clip_id in its
component -- exactly the oracle's union-find cluster_id convention
(min-id, SURVEY.md Appendix B item 6).

Scale notes: each round is one join + one partial-agg groupBy on the SAME
key (clip_id), so the shuffle partitioning is reused; checkpointing
truncates the growing lineage each round (SURVEY.md section 4.2); the
convergence check is a driver-side count of changed labels only.

Checkpoint mode: ``localCheckpoint`` (default) stores blocks on executors
-- cheapest, but a lost executor on a real cluster loses blocks and fails
the job.  ``cfg.cc_reliable_checkpoint=True`` switches every round to
reliable ``checkpoint()`` into the SparkContext checkpoint dir (set it to
HDFS/S3 on a cluster; a temp dir is provisioned automatically in local
mode).  Execution-only knob: results are identical (pinned by test).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from locality_sensitive_hashing_spark.config import Config


def _checkpointer(df: DataFrame, cfg: Config):
    if not cfg.cc_reliable_checkpoint:
        return df.localCheckpoint()
    sc = df.sparkSession.sparkContext
    if sc._jsc.sc().getCheckpointDir().isEmpty():
        # local-mode convenience only; clusters must set a durable dir
        sc.setCheckpointDir(tempfile.mkdtemp(prefix="lsh_cc_ckpt_"))
    return df.checkpoint()


def connected_components(
    edges: DataFrame, nodes: DataFrame, cfg: Config
) -> DataFrame:
    """(clip_id, cluster_id) with cluster_id = min clip_id in component.

    ``edges``: (id1, id2) verified dup pairs; ``nodes``: (clip_id) the full
    clip universe (singletons label themselves).
    """
    sym = _checkpointer(
        edges.select(F.col("id1").alias("src"), F.col("id2").alias("dst"))
        .unionByName(
            edges.select(F.col("id2").alias("src"), F.col("id1").alias("dst"))
        )
        .distinct(),
        cfg,
    )
    labels = _checkpointer(
        nodes.select("clip_id", F.col("clip_id").alias("cluster_id")), cfg
    )

    for _ in range(cfg.cc_max_iters):
        # neighbor label messages: dst receives src's current label
        msgs = (
            sym.join(labels, sym.src == labels.clip_id)
            .select(F.col("dst").alias("clip_id"), "cluster_id")
        )
        new_labels = _checkpointer(
            labels.unionByName(msgs)
            .groupBy("clip_id")
            .agg(F.min("cluster_id").alias("cluster_id")),
            cfg,
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "clip_id")
            .where(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected components did not converge in {cfg.cc_max_iters} iters"
    )


def merge_clusters(
    prev: DataFrame, new_edges: DataFrame, new_nodes: DataFrame, cfg: Config
) -> DataFrame:
    """Incremental CC: fold NEW verified edges + NEW nodes into an existing
    (clip_id, cluster_id) assignment WITHOUT re-clustering the corpus.

    Previous components are CONTRACTED to their labels: each new edge's
    endpoints map to their previous cluster_id (or to themselves when the
    endpoint is a new node), :func:`connected_components` runs on that
    contracted graph -- whose size scales with the batch, not the corpus --
    and old assignments relabel through the resulting old-label -> new-label
    mapping with one join (broadcast-sized: at most one row per touched
    component). Because a previous label IS the min clip_id of its
    component, the min label of a merged contracted component equals the
    min clip_id of the merged component, so the result is IDENTICAL to
    full CC over the union of all edges and nodes (pinned by test).

    Requirements: ``new_nodes`` is disjoint from ``prev`` ids (the intake
    store's per-batch dedup guarantees this), and every ``new_edges``
    endpoint appears in ``prev`` or ``new_nodes``.
    """
    l1 = prev.select(F.col("clip_id").alias("id1"), F.col("cluster_id").alias("_l1"))
    l2 = prev.select(F.col("clip_id").alias("id2"), F.col("cluster_id").alias("_l2"))
    contracted = (
        new_edges.join(l1, "id1", "left")
        .join(l2, "id2", "left")
        .select(
            F.coalesce("_l1", F.col("id1")).alias("id1"),
            F.coalesce("_l2", F.col("id2")).alias("id2"),
        )
        .where(F.col("id1") != F.col("id2"))
    )
    cnodes = (
        contracted.select(F.col("id1").alias("clip_id"))
        .unionByName(contracted.select(F.col("id2").alias("clip_id")))
        .unionByName(new_nodes.select("clip_id"))
        .distinct()
    )
    mapping = connected_components(contracted, cnodes, cfg).select(
        F.col("clip_id").alias("_from"), F.col("cluster_id").alias("_to")
    )
    updated_prev = (
        prev.join(mapping, prev.cluster_id == mapping._from, "left")
        .select(
            "clip_id",
            F.coalesce("_to", F.col("cluster_id")).alias("cluster_id"),
        )
    )
    new_assign = (
        new_nodes.select("clip_id")
        .join(mapping, new_nodes.clip_id == mapping._from, "left")
        .select("clip_id", F.coalesce("_to", F.col("clip_id")).alias("cluster_id"))
    )
    return updated_prev.unionByName(new_assign)
