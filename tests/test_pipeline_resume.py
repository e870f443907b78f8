"""T4 (resume semantics) and T5 (skew) from SURVEY.md §5.2."""

import json
from pathlib import Path

import pyspark.sql.functions as F
import pytest

from probminhash_spark.config import DedupConfig
from probminhash_spark.corpus import inject_viral_block, make_corpus
from probminhash_spark.operators.dedup import band_explode, candidate_pairs, with_doc_id, with_signature
from probminhash_spark.pipeline.dedup_pipeline import run_pipeline
from probminhash_spark.pipeline.manifest import read_manifest

CFG = DedupConfig(threshold=0.8, est_low_cut=0.4)


def test_resume_skips_complete_stages(spark, tiny_corpus, tmp_path):
    files = spark.createDataFrame(tiny_corpus.files)
    root = str(tmp_path / "ckpt")
    first = run_pipeline(spark, files, CFG, root)
    assert first["resumed_stages"] == []
    assert first["sha256_checked"] == 200
    m1 = read_manifest(root, "signatures")
    second = run_pipeline(spark, files, CFG, root)
    assert set(second["resumed_stages"]) == {
        "signatures", "bands", "candidates", "edges", "clusters",
    }
    # stages were NOT recomputed: manifest timestamps unchanged
    m2 = read_manifest(root, "signatures")
    assert m1["completed_at_unix"] == m2["completed_at_unix"]
    # identical final counters
    for k in ("files", "candidate_pairs", "duplicate_edges", "duplicate_groups"):
        assert first[k] == second[k], k


def test_resume_mid_run_after_kill(spark, tiny_corpus, tmp_path):
    """Simulate a crash after stage 2: only later stages recompute."""
    files = spark.createDataFrame(tiny_corpus.files)
    root = str(tmp_path / "ckpt2")
    run_pipeline(spark, files, CFG, root)
    # wipe downstream stages as if the run died before candidates completed
    for stage in ("candidates", "edges", "clusters", "dropped_buckets"):
        mf = Path(root) / stage / "_manifest.json"
        if mf.exists():
            mf.unlink()
    res = run_pipeline(spark, files, CFG, root)
    assert set(res["resumed_stages"]) == {"signatures", "bands"}
    assert res["duplicate_groups"] > 0


def test_config_change_invalidates_checkpoints(spark, tiny_corpus, tmp_path):
    files = spark.createDataFrame(tiny_corpus.files)
    root = str(tmp_path / "ckpt3")
    run_pipeline(spark, files, CFG, root)
    other = DedupConfig(threshold=0.9, est_low_cut=0.4)
    res = run_pipeline(spark, files, other, root)
    assert res["resumed_stages"] == []


def test_mega_bucket_star_cap_and_cluster_recall(spark, tmp_path):
    """F5 skew: a flood of identical files (every band bucket > cap) plus a
    viral license header.  The star cap must bound pair expansion to O(size)
    while the *cluster assignment* (the north-rule metric) stays equal to the
    exact-truth partition."""
    import pandas as pd

    corpus = make_corpus(n_files=260, n_clusters=10, seed=11)
    base = corpus.files
    flood_src = base.iloc[200]
    clones = pd.DataFrame(
        [
            {
                "repo": f"org/flood-{i:04d}",
                "path": "src/flood/copy.py",
                "commit": f"{i:040d}",
                "lang": "py",
                "content": flood_src.content,
            }
            for i in range(40)
        ]
    )
    viral = inject_viral_block(base, fraction=0.3, seed=7, repeats=10)
    all_files = pd.concat([viral, clones], ignore_index=True)
    from probminhash_spark.corpus import exact_truth

    truth_pairs, truth_clusters = exact_truth(
        all_files["content"].tolist(), "char", 8, CFG.threshold
    )
    files = with_doc_id(spark.createDataFrame(all_files), ["repo", "path", "commit"])
    cfg_capped = DedupConfig(threshold=0.8, est_low_cut=0.4, bucket_cap=20)
    sigs = with_signature(files, cfg_capped).select("doc_id", "sig").cache()
    bands = band_explode(sigs, cfg_capped)
    pairs, capped = candidate_pairs(bands, cfg_capped)
    pairs = pairs.cache()
    n_pairs = pairs.count()
    # the flood group (41 members > cap=20) must be star-capped and audited
    assert capped.count() > 0, "expected mega buckets to be star-capped"
    n = len(all_files)
    assert n_pairs < n * (n - 1) / 2 / 4, "pair expansion must stay far from O(n^2)"
    # cluster-level recall: partitions must match exactly
    from probminhash_spark.operators.components import assign_clusters
    from probminhash_spark.operators.dedup import estimate_pair_jaccard, verify_pairs

    est = estimate_pair_jaccard(pairs, sigs, cfg_capped)
    edges = verify_pairs(est, files.select("doc_id", "content"), cfg_capped)
    clustered = assign_clusters(files.select("doc_id"), edges)
    got = {r["doc_id"]: r["cluster_id"] for r in clustered.collect()}
    rows = files.select("repo", "path", "commit", "doc_id").collect()
    key_to_id = {(r["repo"], r["path"], r["commit"]): r["doc_id"] for r in rows}
    pos = {
        i: key_to_id[(all_files.repo[i], all_files.path[i], all_files.commit[i])]
        for i in range(n)
    }
    oracle = {
        pos[int(r.doc_pos)]: pos[int(r.cluster_id)]
        for r in truth_clusters.itertuples()
    }

    def partition(assign):
        groups = {}
        for k, v in assign.items():
            groups.setdefault(v, set()).add(k)
        return {frozenset(g) for g in groups.values() if len(g) > 1}

    assert partition(got) == partition(oracle)
