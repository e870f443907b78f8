"""Group-level sketch operators: the distributed payoff of SetSketch
mergeability (``setsketcher.rs:428-446``) — union sketches and distinct
counts per group (repo, lang, ...) via slot-wise max aggregation.

Register vectors travel as little-endian-packed u16 ``binary`` columns; the
merge is associative+commutative so it could also run as a treeAggregate —
here it's a grouped applyInPandas (one shuffle on the group key).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..config import DedupConfig
from ..functions.sketch_udfs import make_setsketch_udf
from ..kernels.setsketch import SetSketchParams, setsketch_cardinality


def group_distinct_shingles(
    docs: DataFrame,
    group_cols: list[str],
    cfg: DedupConfig,
    content_col: str = "content",
) -> DataFrame:
    """Per-group estimate of DISTINCT shingles across all group members:
    sketch each row, slot-wise-max within the group, invert to cardinality.

    This is what `approx_count_distinct` cannot give you: the same registers
    also feed Jaccard estimates between groups, and group sketches merge
    further up a rollup hierarchy for free.
    """
    from .dedup import ensure_parallelism

    params = SetSketchParams(m=cfg.setsketch_m)
    reg_udf = make_setsketch_udf(cfg)
    sketched = ensure_parallelism(docs).select(
        *group_cols, reg_udf(F.col(content_col)).alias("regs")
    )

    out_schema = (
        ", ".join(f"{c} string" for c in group_cols)
        + ", n_docs long, est_distinct_shingles double, union_regs binary"
    )

    def merge_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        regs = np.stack(
            [np.frombuffer(b, dtype="<u2") for b in pdf["regs"]]
        )
        union = regs.max(axis=0)
        card, _ = setsketch_cardinality(union.astype(np.float64), params)
        return pd.DataFrame(
            [
                {
                    **{c: k for c, k in zip(group_cols, key)},
                    "n_docs": len(pdf),
                    "est_distinct_shingles": float(card),
                    "union_regs": union.astype("<u2").tobytes(),
                }
            ]
        )

    return sketched.groupBy(*group_cols).applyInPandas(merge_group, out_schema)


def group_jaccard(
    group_sketches: DataFrame,
    cfg: DedupConfig,
    key_col: str,
) -> DataFrame:
    """Pairwise Jaccard between group union sketches (e.g. how similar two
    repos' shingle vocabularies are) — three estimators per pair, one
    vectorized UDF pass:

    - ``j_est``    register-equality fraction (``jaccard.rs:27-41``)
    - ``j_mle``    joint MLE via golden-section (S21, ``setsketcher.rs:571-672``)
    - ``j_mle_b1`` closed-form b->1 MLE (S22, ``setsketcher.rs:674-713``)

    The MLE columns matter at low J (< ~0.1) where the equality estimator
    loses precision (reference test ``setsketcher.rs:967-1019``).
    """
    from ..kernels.setsketch import setsketch_jaccard_mle, setsketch_jaccard_mle_b1

    params = SetSketchParams(m=cfg.setsketch_m)
    a = group_sketches.select(
        F.col(key_col).alias("key_l"), F.col("union_regs").alias("regs_l")
    )
    b = group_sketches.select(
        F.col(key_col).alias("key_r"), F.col("union_regs").alias("regs_r")
    )
    pairs = a.join(b, F.col("key_l") < F.col("key_r"))

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("j_est double, j_mle double, j_mle_b1 double")
    def estimators(l: pd.Series, r: pd.Series) -> pd.DataFrame:
        if len(l) == 0:
            return pd.DataFrame({"j_est": [], "j_mle": [], "j_mle_b1": []})
        la = np.stack([np.frombuffer(x, dtype="<u2") for x in l])
        ra = np.stack([np.frombuffer(x, dtype="<u2") for x in r])
        return pd.DataFrame(
            {
                "j_est": (la == ra).mean(axis=1),
                "j_mle": setsketch_jaccard_mle(la, ra, params),
                "j_mle_b1": setsketch_jaccard_mle_b1(la, ra, params),
            }
        )

    return (
        pairs.withColumn("j", estimators("regs_l", "regs_r"))
        .select("key_l", "key_r", "j.j_est", "j.j_mle", "j.j_mle_b1")
    )