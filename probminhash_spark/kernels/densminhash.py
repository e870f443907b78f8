"""Vectorized One-Permutation-Hashing MinHash with optimal densification.

Port of ``densminhash.rs`` (OptDensMinHash, Shrivastava 2017; RevOptDensMinHash,
Mai et al. 2020).  This is the reference's raw-speed sketch — exactly one RNG
seed + 2 draws per item (``densminhash.rs:191-209``) — and our production
default for LSH banding at 10^12-file scale.

- sketch: per item, ``r ~ U[0,1)``, ``bin ~ U[0,m)`` from the item-seeded
  Xoshiro256++; keep per-bin min ``r`` plus the winning item hash
  (``values[k] = hval1``, ``densminhash.rs:203``).
- densify: each empty bin ``k`` probes bins with an rng seeded ``k + 123743``
  until it hits a filled one and copies it (``densminhash.rs:225-253``).
  The probe sequence is data-independent per bin, so we precompute one probe
  table and densify the whole batch with gathers.  Documented deviation: the
  probe rng is Xoshiro256++ instead of ChaCha12 — distribution-identical
  uniform probes, stream-different.

Empty-slot filling mirrors get_hsketch_u64 (``densminhash.rs:117-133``): the
signature carries winning item hashes, which band directly into 64-bit LSH
keys.
"""

from __future__ import annotations

import numpy as np

from .hashes import hash_u64
from .rng import Xoshiro256pp

U64 = np.uint64
_LARGE = float(np.uint32(0xFFFFFFFF))


def optdens_minhash_batch(
    doc_idx: np.ndarray,
    item_hash: np.ndarray,
    ndocs: int,
    m: int,
    hasher: str = "nohash",
) -> tuple[np.ndarray, np.ndarray]:
    """OPH+densification sketches -> (hsketch f64 (ndocs,m), values u64 (ndocs,m)).

    Fully vectorized: O(n) draws for the bin pass and O(ndocs * m) for
    densification.
    """
    doc_idx = np.ascontiguousarray(doc_idx, dtype=np.int64)
    item_hash = np.ascontiguousarray(item_hash, dtype=U64)
    seeds = hash_u64(item_hash, hasher)
    rng = Xoshiro256pp(seeds)
    r = rng.next_f64()
    k = rng.next_below(m).astype(np.int64)

    vals = np.full(ndocs * m, _LARGE, dtype=np.float64)
    winner = np.zeros(ndocs * m, dtype=U64)
    flat = doc_idx * m + k
    # argmin per bin: reference uses `r <= hsketch` (last equal wins,
    # densminhash.rs:201); ties on distinct items are measure-zero
    order = np.lexsort((r, flat))
    fk = flat[order]
    first = np.empty(fk.shape[0], dtype=bool)
    if fk.shape[0]:
        first[0] = True
        first[1:] = fk[1:] != fk[:-1]
        sel = order[first]
        vals[flat[sel]] = r[sel]
        winner[flat[sel]] = seeds[sel]

    vals = vals.reshape(ndocs, m)
    winner = winner.reshape(ndocs, m)
    _densify(vals, winner, m)
    return vals, winner


def _probe_table(m: int, depth: int) -> np.ndarray:
    """Probe sequences per bin: row k = probes of rng(seed k+123743)
    (``densminhash.rs:236``)."""
    rng = Xoshiro256pp(np.arange(m, dtype=np.int64).astype(U64) + U64(123743))
    cols = [rng.next_below(m).astype(np.int32) for _ in range(depth)]
    return np.stack(cols, axis=1)  # (m, depth)


def _densify(vals: np.ndarray, winner: np.ndarray, m: int) -> None:
    """Optimal densification over the whole batch (``densminhash.rs:225-253``)."""
    filled = vals < _LARGE
    any_filled = filled.any(axis=1)
    need = filled.sum(axis=1) < m
    target = need & any_filled
    if not target.any():
        return
    depth = 32
    table = _probe_table(m, depth)
    docs = np.nonzero(target)[0]
    # (doc, empty bin) pairs
    d_rep, bins = np.nonzero(~filled[docs])
    d_rep = docs[d_rep]
    pending = np.ones(d_rep.shape[0], dtype=bool)
    t = 0
    rng_extra = None
    while pending.any():
        if t >= table.shape[1]:
            # extend probe table lazily
            if rng_extra is None:
                rng_extra = Xoshiro256pp(
                    np.arange(m, dtype=np.int64).astype(U64) + U64(123743)
                )
                for _ in range(table.shape[1]):
                    rng_extra.next_below(m)
            table = np.concatenate(
                [table, rng_extra.next_below(m).astype(np.int32)[:, None]], axis=1
            )
        probe = table[bins[pending], t]
        rows = d_rep[pending]
        hit = filled[rows, probe]
        if hit.any():
            src_rows = rows[hit]
            src_bins = probe[hit]
            dst_bins = bins[pending][hit]
            vals[src_rows, dst_bins] = vals[src_rows, src_bins]
            winner[src_rows, dst_bins] = winner[src_rows, src_bins]
            idx_pending = np.nonzero(pending)[0]
            pending[idx_pending[hit]] = False
        t += 1


def minhash_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """Equal-slot fraction (``jaccard.rs:9-19``; any PartialEq slot type)."""
    return float(np.mean(sig_a == sig_b))
