"""Vectorized SuperMinHash (Ertl, arXiv:1706.05698).

Port of ``superminhasher.rs:186-267`` re-derived for batch execution.  Per
item the reference draws, for ``j = 0..a_upper``: ``r_j ~ U[0,1)`` and
``k_j ~ U[j, m)`` from the item-seeded Xoshiro256++ and maintains a lazy
Fisher-Yates permutation ``p``; slot ``p[j]`` receives candidate value
``r_j + j`` under min semantics (``superminhasher.rs:201-237``).

Batch equivalence argument: the per-item draw stream is consumed in fixed
``j`` order regardless of global state; iterations beyond the reference's
``a_upper`` produce candidates with value ``r_j + j >= j > max slot value``
which can never win, so running a *conservative* (stale, larger) per-doc upper
bound yields the identical final sketch.  We recompute the per-doc bound
between lane chunks: the histogram-driven shrink of ``a_upper``
(``superminhasher.rs:221-237``) becomes ``floor(max_slot_value)`` — the
tightest j that can still be beaten.

The sketch value domain is [0, m) floats (``hsketch``), plus we carry the
winning item hash per slot for direct 64-bit LSH banding.
"""

from __future__ import annotations

import numpy as np

from .hashes import hash_u64
from .rng import Xoshiro256pp

U64 = np.uint64
_LARGE = float(np.uint32(0xFFFFFFFF))  # init value, superminhasher.rs:125


def _xoshiro_from_state(state: np.ndarray) -> Xoshiro256pp:
    rng = object.__new__(Xoshiro256pp)
    rng.s = state
    return rng


def _argmin_reduce(flat_keys, values, payload):
    order = np.lexsort((values, flat_keys))
    fk = flat_keys[order]
    first = np.empty(fk.shape[0], dtype=bool)
    first[0] = True
    first[1:] = fk[1:] != fk[:-1]
    sel = order[first]
    return flat_keys[sel], values[sel], payload[sel]


def superminhash_batch(
    doc_idx: np.ndarray,
    item_hash: np.ndarray,
    ndocs: int,
    m: int,
    hasher: str = "nohash",
    lanes_per_chunk: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Unweighted sketches -> (hsketch f64 (ndocs,m), winner item u64 (ndocs,m)).

    Duplicate items are harmless (idempotent re-draws of the same stream,
    exercised by ``setsketcher.rs:878-901`` for the same pattern) but callers
    should dedupe for speed.
    """
    doc_idx = np.ascontiguousarray(doc_idx, dtype=np.int64)
    item_hash = np.ascontiguousarray(item_hash, dtype=U64)
    vals = np.full(ndocs * m, _LARGE, dtype=np.float64)
    winner = np.zeros(ndocs * m, dtype=U64)
    if lanes_per_chunk is None:
        lanes_per_chunk = max(256, (1 << 22) // max(m, 1))

    seeds = hash_u64(item_hash, hasher)
    n = doc_idx.shape[0]
    for lo in range(0, n, lanes_per_chunk):
        hi = min(lo + lanes_per_chunk, n)
        docs = doc_idx[lo:hi]
        items = item_hash[lo:hi]
        state = Xoshiro256pp(seeds[lo:hi]).s
        nl = docs.shape[0]
        # conservative per-lane upper bound: floor(max slot value) of the doc
        doc_upper = np.minimum(
            np.floor(vals.reshape(ndocs, m).max(axis=1)), m - 1
        ).astype(np.int64)
        upper = doc_upper[docs]
        p = np.tile(np.arange(m, dtype=np.int32), (nl, 1))
        rows = np.arange(nl)
        rng = _xoshiro_from_state(state)
        cand_flat, cand_val, cand_item = [], [], []
        jmax = int(upper.max(initial=-1))
        for j in range(jmax + 1):
            active = upper >= j
            if not active.any():
                break
            r = rng.next_f64(active)
            k = rng.next_in_range(j, m, active).astype(np.int64)
            ar = rows[active]
            ak = k[active]
            # lazy Fisher-Yates swap of positions j and k (superminhasher.rs:207-215)
            pj = p[ar, j].copy()
            p[ar, j] = p[ar, ak]
            p[ar, ak] = pj
            slot = p[ar, j].astype(np.int64)
            cand_flat.append(docs[ar] * m + slot)
            cand_val.append(r[active] + j)
            cand_item.append(items[ar])
        if cand_flat:
            flat = np.concatenate(cand_flat)
            val = np.concatenate(cand_val)
            itm = np.concatenate(cand_item)
            fk, fv, fi = _argmin_reduce(flat, val, itm)
            better = fv < vals[fk]
            vals[fk[better]] = fv[better]
            winner[fk[better]] = fi[better]
    return vals.reshape(ndocs, m), winner.reshape(ndocs, m)


def superminhash_single(items, m, hasher="fnv1a64"):
    items = np.asarray(items, dtype=U64)
    vals, win = superminhash_batch(
        np.zeros(items.shape[0], dtype=np.int64), items, 1, m, hasher
    )
    return vals[0], win[0]


def superminhash_jaccard(sk_a: np.ndarray, sk_b: np.ndarray) -> float:
    """Equal-slot fraction estimator (``superminhasher.rs:278-302``)."""
    assert sk_a.shape == sk_b.shape
    return float(np.mean(sk_a == sk_b))
