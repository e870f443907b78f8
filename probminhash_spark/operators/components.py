"""Connected components over a DataFrame edge list.

Spark has no fixpoint operator (SURVEY.md §4.2), so this is a driver loop of
pure DataFrame transforms with ``localCheckpoint`` per iteration to cut
lineage.  Two algorithms:

- ``two_phase`` (default): alternating large-star / small-star
  (Kiveris et al., "Connected Components in MapReduce and Beyond", SOCC'14) —
  O(log n) rounds even on adversarial chain graphs, each round two
  shuffle-bound groupBy/join stages.  This is the 10^12-scale path.
- ``label_prop``: classic min-label propagation — simpler, O(diameter) rounds;
  kept as a cross-check oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .cache import pin_local_checkpoint, release_local_checkpoint


def _canon(edges: DataFrame) -> DataFrame:
    return (
        edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    both = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    mins = both.groupBy("src").agg(F.min("dst").alias("mn"))
    mins = mins.select("src", F.least("mn", F.col("src")).alias("mn"))
    return (
        both.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("mn").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    e = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    mins = e.groupBy("src").agg(F.min("dst").alias("mn"))
    relink = (
        e.join(mins, "src")
        .where(F.col("dst") != F.col("mn"))
        .select(F.col("dst").alias("src"), F.col("mn").alias("dst"))
    )
    selfe = mins.select(F.col("src"), F.col("mn").alias("dst"))
    return relink.union(selfe).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "id_l",
    dst: str = "id_r",
    max_iterations: int = 50,
    algorithm: str = "two_phase",
) -> DataFrame:
    """edge list -> (id, component) with component = min node id of the group.

    Nodes with no edges are absent; callers left-join and coalesce to self
    (see :func:`assign_clusters`).
    """
    e = _canon(edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")))
    # checkpoints route through the cache module: the FINAL round's blocks
    # must outlive this call (the returned plan reads them), so they release
    # at the consumer's cache_scope exit; each SUPERSEDED round is released
    # eagerly below — an iterative loop holds two frontiers, not max_iter
    e = pin_local_checkpoint(e)
    if algorithm == "label_prop":
        return _label_prop(e, max_iterations)
    prev_sig = None
    for _ in range(max_iterations):
        new_e = pin_local_checkpoint(_small_star(_large_star(e)))
        sig_row = new_e.select(
            F.count("*").alias("cnt"),
            F.coalesce(F.expr("bit_xor(xxhash64(src, dst))"), F.lit(0)).alias("chk"),
        ).collect()[0]
        # new_e is materialized (eager checkpoint): the previous round's
        # blocks are unreferenced from here on
        release_local_checkpoint(e)
        e = new_e
        sig = (sig_row["cnt"], sig_row["chk"])
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iterations} rounds")
    # fixpoint: edges are (node -> root) stars; roots map to themselves
    comp = e.select(F.col("src").alias("id"), F.col("dst").alias("component"))
    roots = e.select(F.col("dst").alias("id")).distinct().withColumn(
        "component", F.col("id")
    )
    return comp.union(roots).groupBy("id").agg(F.min("component").alias("component"))


def _label_prop(e: DataFrame, max_iterations: int) -> DataFrame:
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    labels = pin_local_checkpoint(nodes.withColumn("component", F.col("id")))
    both = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    both = pin_local_checkpoint(both)
    for _ in range(max_iterations):
        neigh = (
            both.join(labels, both["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("component").alias("nmin"))
        )
        new_labels = pin_local_checkpoint(
            labels.join(neigh, labels["id"] == neigh["src"], "left")
            .select(
                "id", F.least(F.col("component"), F.coalesce("nmin", "component")).alias("component")
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        # `changed` was the last reader of the previous labels round
        release_local_checkpoint(labels)
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(f"label propagation did not converge in {max_iterations} rounds")


def assign_clusters(
    docs: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_l",
    dst: str = "id_r",
    max_iterations: int = 50,
) -> DataFrame:
    """Every doc gets a cluster id: its component root, or itself if unique."""
    comp = connected_components(edges, src, dst, max_iterations)
    return (
        docs.join(comp, docs[id_col] == comp["id"], "left")
        .withColumn("cluster_id", F.coalesce("component", F.col(id_col)))
        .drop("id", "component")
    )
