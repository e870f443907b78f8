"""Group-level SetSketch union operators (S19 mergeability payoff)."""

import numpy as np
import pytest

from probminhash_spark.config import DedupConfig
from probminhash_spark.operators.sketch_ops import group_distinct_shingles, group_jaccard


def test_group_distinct_shingles_and_jaccard(spark, tiny_corpus):
    cfg = DedupConfig(setsketch_m=512)
    files = spark.createDataFrame(tiny_corpus.files)
    groups = group_distinct_shingles(files, ["lang"], cfg).cache()
    rows = {r["lang"]: r for r in groups.collect()}
    assert set(rows) == {"py", "rs", "java", "c", "md"}
    # estimate sanity: each lang group holds ~40 docs x ~100s of distinct
    # shingles; estimates must be positive and within 2x of the exact count
    from probminhash_spark.kernels.shingles import dedupe_counts, shingle_batch

    for lang, r in rows.items():
        texts = tiny_corpus.files[tiny_corpus.files.lang == lang]["content"].tolist()
        d, h = shingle_batch(texts, cfg.shingle_mode, cfg.shingle_size)
        exact = np.unique(h).size
        est = r["est_distinct_shingles"]
        assert 0.5 * exact < est < 2.0 * exact, (lang, exact, est)
        assert r["n_docs"] == len(texts)
    jac = group_jaccard(groups, cfg, "lang")
    vals = jac.collect()
    assert len(vals) == 10  # C(5,2)
    for r in vals:
        assert 0.0 <= r["j_est"] <= 1.0
        # S21/S22 estimators ride along; cross-lang vocabularies are near-
        # disjoint so all three estimators must agree J is small
        assert 0.0 <= r["j_mle"] <= 1.0
        assert r["j_mle_b1"] <= r["j_est"] + 0.1
        assert abs(r["j_mle"] - r["j_mle_b1"]) < 0.05


def test_rollup_equals_direct_aggregation(spark, tiny_corpus):
    """Merging child group sketches up a hierarchy must be BIT-identical to
    aggregating the documents directly at the parent level (associativity/
    commutativity of the slot max — setsketcher.rs:428-446)."""
    from probminhash_spark.operators.sketch_ops import rollup_group_sketches

    cfg = DedupConfig(setsketch_m=256)
    files = tiny_corpus.files.copy()
    # two-level hierarchy: lang -> (lang, repo-bucket)
    files["bucket"] = [f"b{hash(r) % 3}" for r in files["repo"]]
    docs = spark.createDataFrame(files).selectExpr(
        "lang", "bucket", "content"
    )
    children = group_distinct_shingles(docs, ["lang", "bucket"], cfg).cache()
    rolled = {
        r["lang"]: r
        for r in rollup_group_sketches(children, ["lang"], cfg).collect()
    }
    direct = {
        r["lang"]: r
        for r in group_distinct_shingles(docs, ["lang"], cfg).collect()
    }
    assert set(rolled) == set(direct)
    n_children = {
        r["lang"]: r["cnt"]
        for r in children.groupBy("lang").count().withColumnRenamed("count", "cnt").collect()
    }
    for lang in direct:
        assert rolled[lang]["union_regs"] == direct[lang]["union_regs"], lang
        assert rolled[lang]["n_docs"] == direct[lang]["n_docs"]
        assert (
            abs(
                rolled[lang]["est_distinct_shingles"]
                - direct[lang]["est_distinct_shingles"]
            )
            < 1e-9
        )
        assert rolled[lang]["n_child_groups"] == n_children[lang]


def test_group_merge_is_two_phase_and_partition_bounded(spark, tiny_corpus):
    """Scale-safety of the union-sketch merge (round-2 verdict weak #1):
    with one group forced across >= 8 partitions, (a) phase 1 emits at most
    n_partitions x n_groups partial rows — so the final merge never sees a
    whole group, the bounded-peak-memory property — and (b) the two-phase
    result is identical to a single-worker brute-force slot-max."""
    import pandas as pd

    from probminhash_spark.functions.sketch_udfs import make_setsketch_udf
    from probminhash_spark.kernels.setsketch import SetSketchParams, setsketch_cardinality
    from probminhash_spark.operators.sketch_ops import partial_group_sketches

    cfg = DedupConfig(setsketch_m=256)
    files = tiny_corpus.files.copy()
    files["grp"] = "hot"  # ONE group spanning the whole corpus
    n_part = 8
    docs = spark.createDataFrame(files).repartition(n_part)

    partials = partial_group_sketches(docs, ["grp"], cfg).cache()
    n_partials = partials.count()
    assert n_partials <= n_part, (
        f"phase 1 must emit <= 1 row per (partition, group): {n_partials}"
    )

    out = group_distinct_shingles(docs, ["grp"], cfg).collect()
    assert len(out) == 1 and out[0]["n_docs"] == len(files)

    # brute-force oracle: slot-max over every row's registers on one worker
    reg_udf = make_setsketch_udf(cfg)
    import pyspark.sql.functions as F

    rows = (
        spark.createDataFrame(files[["content"]])
        .coalesce(1)
        .select(reg_udf(F.col("content")).alias("regs"))
        .collect()
    )
    all_regs = np.stack([np.frombuffer(r["regs"], "<u2") for r in rows])
    union = all_regs.max(axis=0)
    assert np.frombuffer(out[0]["union_regs"], "<u2").tolist() == union.tolist()
    card, _ = setsketch_cardinality(union.astype(np.float64), SetSketchParams(m=256))
    assert abs(out[0]["est_distinct_shingles"] - float(card)) < 1e-9
