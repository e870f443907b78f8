"""Benchmark harness.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``--scaling`` additionally runs the dedup pipeline at local[8] and local[32]
on the same synthetic corpus and reports files/sec at both plus scaling
efficiency (the BASELINE.json two-cluster-size criterion, sandbox protocol
per BASELINE.md) — results land in BENCH/.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

# must precede the first numpy import (kernel defrag=madvise makes numpy's
# THP madvise trigger synchronous compaction — see BENCH/BASELINE.md)
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_nation_revenue",
    "q_window_top_orders",
    "q_events_tumbling",
    "dedup_minhash_lsh",
    "dedup_exact",
    "ann_cosine_topk",
    "text_token_stats",
    "sketch_signatures",
    "sketch_superminhash",
    # round 2 additions (dedup_substring is oracle-scale all-pairs-exact,
    # benched separately like dedup_ngram_jaccard)
    "sketch_ordminhash",
    "sketch_group_jaccard",
]


def _time_query(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def run_headline(sf_dir: str, cpus: str) -> dict:
    import __spark_entry__ as entry_mod
    from probminhash_spark.session import get_spark

    spark = get_spark(app_name="bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    # steady-state warm-up: touch the scan path and spin up Python workers so
    # the first timed query doesn't absorb one-time costs
    try:
        qs["sketch_superminhash"](spark, sf_dir).limit(256).write.format(
            "noop"
        ).mode("overwrite").save()
    except Exception:
        pass
    # INTERLEAVED min-of-N (r4 noise protocol): run the whole query list N
    # times in round-robin rather than each query's reps back-to-back.  A
    # transient host stall (this microVM swings ~2x) then lands in ONE rep
    # of MANY queries — which the per-query min discards — instead of both
    # reps of ONE query, so round-over-round deltas isolate code effects.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    walls: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(reps):
        for name in HEADLINE:
            try:
                walls[name].append(_time_query(qs[name](spark, sf_dir)))
            except Exception as exc:  # pragma: no cover
                print(f"bench query {name} failed: {exc}", file=sys.stderr)
    timings: dict[str, float] = {
        name: (round(min(w), 3) if w else -1.0) for name, w in walls.items()
    }
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    spark.stop()
    sha_kps = _sha_kernel_throughput()
    total = round(sum(t for t in timings.values() if t > 0), 3)
    lsh_t = timings.get("dedup_minhash_lsh", 0)
    files_per_sec = round(n_docs / lsh_t, 1) if lsh_t and lsh_t > 0 else 0.0
    sf = sf_dir.rstrip("/").split("sf")[-1]
    return {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "dedup_files_per_sec": files_per_sec,
        "n_documents": n_docs,
        "cpus": int(cpus),
        "sha512_256_cold_keys_per_sec": sha_kps["cold"],
        "sha512_256_warm_keys_per_sec": sha_kps["warm"],
    }


def _sha_kernel_throughput(n: int = 200_000) -> dict:
    """Single-core throughput of the vectorized SHA-512/256 identity kernel
    (S6): cold = fresh keys through the lane-vectorized compression; warm =
    repeat keys resolved from the searchsorted digest cache."""
    import numpy as np

    from probminhash_spark.kernels.hashes import sha512_256_states

    rng = np.random.default_rng(5)
    keys = rng.integers(0, 2**63, n, dtype=np.int64).astype(np.uint64)
    other = rng.integers(0, 2**63, n, dtype=np.int64).astype(np.uint64)
    # full-size warm-up with DIFFERENT keys: faults in the arena pages once
    # (the microVM's dominant cold cost) so "cold" measures fresh-key
    # compute, not first-touch page faults
    sha512_256_states(other)
    t0 = time.time()
    sha512_256_states(keys)
    cold = time.time() - t0
    t0 = time.time()
    sha512_256_states(keys)
    warm = time.time() - t0
    return {"cold": round(n / cold), "warm": round(n / warm)}


def _scaling_corpus(n_files: int) -> str:
    """Deterministic bench corpus cached as parquet (FIXTURES.md F1 'bench')."""
    path = f"/tmp/probminhash_bench_corpus_{n_files}.parquet"
    if not os.path.exists(path):
        from probminhash_spark.corpus import generate_files

        generate_files(
            n_files=n_files, n_clusters=n_files // 25, min_tokens=120, max_tokens=600
        ).to_parquet(path)
    return path


def _dedup_wall_clock(
    master: str, corpus_path: str, shuffle_partitions: int, reps: int = 4
) -> dict:
    """sketch+band+candidates+verify wall clock (no checkpoint IO, no
    clustering driver loop — the throughput-bound stages)."""
    from probminhash_spark.config import DedupConfig
    from probminhash_spark.operators.dedup import dedup_edges, with_doc_id
    from probminhash_spark.session import get_spark

    spark = get_spark(
        app_name=f"bench-{master}", master=master, shuffle_partitions=shuffle_partitions
    )
    try:
        spark.sparkContext.setLogLevel("ERROR")
        ncores = int(master.split("[")[1].rstrip("]"))
        files = with_doc_id(
            spark.read.parquet(corpus_path), ["repo", "path", "commit"]
        )
        files = files.repartition(ncores * 2).cache()
        n = files.count()
        cfg = DedupConfig()
        # warm-up: one full pass so every reused Python worker has touched
        # its arena; then min of N timed passes (steady-state — 100 TB
        # executors are long-lived; this microVM has heavy run-to-run
        # variance)
        from probminhash_spark.operators.cache import cache_scope

        with cache_scope():
            dedup_edges(files, cfg).write.format("noop").mode("overwrite").save()
        walls = []
        for _ in range(reps):
            t0 = time.time()
            with cache_scope():
                dedup_edges(files, cfg).write.format("noop").mode(
                    "overwrite"
                ).save()
            walls.append(time.time() - t0)
        wall = min(walls)
    finally:
        # always stop, even on a failed leg: a half-dead session left active
        # would be silently reused (getOrCreate) by the retry/next leg
        spark.stop()
    return {"master": master, "files": n, "wall_sec": round(wall, 2),
            "walls_all": [round(w, 2) for w in walls],
            "files_per_sec": round(n / wall, 1)}


def run_scaling(n_files: int, reps: int = 4) -> dict:
    """Two N->4N pairs on the same input (BASELINE.md sandbox protocol):
    2->8 cores (below the microVM's ~10 GB/s memory-bandwidth ceiling, the
    honest analogue of adding executors) and 8->32 (documents the ceiling)."""
    corpus = _scaling_corpus(n_files)

    def leg(master, parts):
        # one retry per leg + per-leg progress line on stderr: local-mode
        # session restarts occasionally race block-manager cleanup ("Block
        # rdd_N does not exist"), and a 3-leg x ~30-min run should not lose
        # its completed legs to one transient
        for attempt in (1, 2):
            try:
                out = _dedup_wall_clock(master, corpus, parts, reps)
                print(f"leg {master}: {out}", file=sys.stderr)
                return out
            except Exception as exc:  # pragma: no cover — transient flake
                print(f"leg {master} attempt {attempt} failed: {exc}", file=sys.stderr)
                if attempt == 2:
                    raise
                time.sleep(10)

    t2 = leg("local[2]", 4)
    t8 = leg("local[8]", 16)
    t32 = leg("local[32]", 64)
    eff_2_8 = (t2["wall_sec"] / t8["wall_sec"]) / 4.0
    eff_8_32 = (t8["wall_sec"] / t32["wall_sec"]) / 4.0
    out = {
        "metric": "dedup_scaling_efficiency_2_to_8",
        "value": round(eff_2_8, 3),
        "unit": "ratio",
        "eff_8_to_32": round(eff_8_32, 3),
        "runs": {"local2": t2, "local8": t8, "local32": t32},
        "n_files": n_files,
    }
    Path("BENCH").mkdir(exist_ok=True)
    Path("BENCH/scaling.json").write_text(json.dumps(out, indent=2))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--scaling-files", type=int, default=20000)
    ap.add_argument("--scaling-reps", type=int, default=4)
    args = ap.parse_args()
    if args.scaling:
        print(json.dumps(run_scaling(args.scaling_files, args.scaling_reps)))
        return 0
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    print(json.dumps(run_headline(sf_dir, cpus)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
