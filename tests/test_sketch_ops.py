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
