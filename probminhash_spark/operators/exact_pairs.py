"""Exact all-pairs-above-threshold Jaccard, 100 TB-shaped.

The naive formulation (gram table self-joined on the gram) emits
``sum_g df(g)^2`` rows — a viral 8-gram with document frequency d costs
d^2/2 join rows before any filtering.  These operators bound that:

1. candidate generation reuses the dedup pipeline's bucket-capped expansion
   (``candidate_pairs``): each shared-feature bucket expands pairwise up to
   ``cfg.bucket_cap`` and as a bounded star beyond it (with the audit
   side-channel / ``on_capped='fail'`` oracle guard);
2. intersection sizes are computed PAIR-BOUNDED — candidates join back to
   the feature table on (id, feature), so the volume is
   |candidates| x features-per-doc, never feature-df^2.

Exactness: a pair with J >= t > 0 shares >= 1 feature, so it appears in at
least one bucket; with ``on_capped='fail'`` (no bucket capped) the output
equals the brute-force all-pairs answer — the driver's DuckDB oracles
verify exactly that.  Everything is native Spark SQL (zero Python UDFs).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..config import DedupConfig
from .cache import pin
from .dedup import candidate_pairs


def _capped_guard(capped: DataFrame, on_capped: str, cfg: DedupConfig) -> None:
    if on_capped == "fail":
        hit = capped.limit(1).collect()
        if hit:
            r = hit[0]
            raise RuntimeError(
                f"feature bucket (key={r['band_key']}) has {r['bucket_size']}"
                f" members > bucket_cap={cfg.bucket_cap}; star-capped output"
                " would diverge from an all-pairs oracle — raise bucket_cap"
                " or use on_capped='star'"
            )
    elif on_capped != "star":  # pragma: no cover
        raise ValueError(f"bad on_capped {on_capped!r}")


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    gram_len: int = 8,
    cfg: DedupConfig | None = None,
    on_capped: str = "star",
    id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """Exact distinct-char-n-gram Jaccard pairs with J >= ``threshold``.

    Output: (id_l, id_r, j_exact) — identical to the brute-force shared-gram
    self-join when no bucket is capped (IEEE division of exact integer
    counts, so DuckDB replays it bit-for-bit).

    Note: the gram table is persisted for the returned query's lifetime (it
    feeds four subtrees: buckets, sizes, and both intersection sides).
    Wrap build + execution in ``operators.cache.cache_scope()`` to release
    it; outside a scope the persist is caller-managed (``clearCache()``) —
    same contract as ``dedup_edges``' signature persist.
    """
    cfg = cfg or DedupConfig()
    grams = pin(
        docs.select(
            F.col(id_col),
            F.explode(
                F.array_distinct(
                    F.expr(
                        f"transform(sequence(1, greatest(length({content_col})"
                        f" - {gram_len - 1}, 1)), i -> substring({content_col},"
                        f" i, {gram_len}))"
                    )
                )
            ).alias("g"),
        )
    )
    sizes = grams.groupBy(id_col).agg(F.count("*").alias("n"))
    # bucket-capped candidates: xxhash64(gram) buckets (a 2^-64 collision
    # only ADDS a candidate, which the exact intersection count then rejects)
    bands = grams.select(
        F.col(id_col), F.lit(0).alias("band_id"), F.xxhash64("g").alias("band_key")
    )
    pairs, capped = candidate_pairs(
        bands, cfg, id_col, pin_buckets=(on_capped == "fail")
    )
    _capped_guard(capped, on_capped, cfg)
    gl = grams.select(F.col(id_col).alias("id_l"), "g")
    gr = grams.select(F.col(id_col).alias("id_r"), "g")
    inter = (
        pairs.join(gl, "id_l")
        .join(gr, ["id_r", "g"])
        .groupBy("id_l", "id_r")
        .agg(F.count("*").alias("i"))
    )
    out = (
        inter.join(
            sizes.withColumnsRenamed({id_col: "id_l", "n": "n_l"}), "id_l"
        )
        .join(sizes.withColumnsRenamed({id_col: "id_r", "n": "n_r"}), "id_r")
        .withColumn(
            "j_exact",
            F.col("i").cast("double") / (F.col("n_l") + F.col("n_r") - F.col("i")),
        )
        .where(F.col("j_exact") >= threshold)
        .select("id_l", "id_r", "j_exact")
    )
    return out


def weighted_token_jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    token_re: str,
    cfg: DedupConfig | None = None,
    on_capped: str = "star",
    id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """Exact WEIGHTED (multiset) token Jaccard pairs with J_w >= threshold:
    ``sum_t min(c_a, c_b) / sum_t max(c_a, c_b)`` — the quantity the
    ProbMinHash family estimates.  Same bucket-capped candidate / pair-
    bounded intersection shape as :func:`ngram_jaccard_pairs`.

    Output: (id_l, id_r, j_weighted ROUND 6).
    """
    cfg = cfg or DedupConfig()
    # bind the pattern as a literal (not an interpolated SQL string) so
    # regexes containing quotes can't break / alter the expression.
    # Persist lifetime: caller's cache_scope() (see ngram_jaccard_pairs).
    toks = pin(
        docs.select(
            F.col(id_col),
            F.explode(
                F.regexp_extract_all(F.col(content_col), F.lit(token_re), 0)
            ).alias("tok"),
        )
        .groupBy(id_col, "tok")
        .agg(F.count("*").alias("c"))
    )
    tot = toks.groupBy(id_col).agg(F.sum("c").alias("n"))
    bands = toks.select(
        F.col(id_col), F.lit(0).alias("band_id"), F.xxhash64("tok").alias("band_key")
    )
    pairs, capped = candidate_pairs(
        bands, cfg, id_col, pin_buckets=(on_capped == "fail")
    )
    _capped_guard(capped, on_capped, cfg)
    tl = toks.select(F.col(id_col).alias("id_l"), "tok", F.col("c").alias("c_l"))
    tr = toks.select(F.col(id_col).alias("id_r"), "tok", F.col("c").alias("c_r"))
    inter = (
        pairs.join(tl, "id_l")
        .join(tr, ["id_r", "tok"])
        .groupBy("id_l", "id_r")
        .agg(F.sum(F.least("c_l", "c_r")).alias("smin"))
    )
    out = (
        inter.join(tot.withColumnsRenamed({id_col: "id_l", "n": "n_l"}), "id_l")
        .join(tot.withColumnsRenamed({id_col: "id_r", "n": "n_r"}), "id_r")
        .withColumn(
            "jw",
            F.col("smin").cast("double")
            / (F.col("n_l") + F.col("n_r") - F.col("smin")),
        )
        .where(F.col("jw") >= threshold)
        .select("id_l", "id_r", F.round("jw", 6).alias("j_weighted"))
    )
    return out
