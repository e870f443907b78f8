"""ProbOrdMinHash2 — order-sensitive (edit-distance) locality-sensitive
hashing.  Port of ``probordminhash2.rs`` (Ertl's FastOrderMinHash2; Marcais
et al., "Locality sensitive hashing for the edit distance", 2019).

Semantics (``probordminhash2.rs:234-306``):
- For each position i, the element's hash and its running occurrence count
  seed an rng (``:270-276`` — seed words [id_hash, occurrence, instance_seed, 0]).
- An Exp1 chain ``x += Exp1 * g[nb]``, ``g[i] = m/(m-i)`` (``:216-217``) walks
  slots chosen by lazy Fisher-Yates sampling without replacement; each slot
  keeps the l smallest (x, position) pairs (``OrdMinHashStore``, ``:85-115``).
- Signature slot k = a 64-bit combine of the hashes of the l data elements at
  the stored positions, sorted by position (``create_signature``, ``:128-172``
  — WyHash there; SplitMix-chain combine here, documented deviation, as is
  inverse-CDF Exp1).

This operator is *intentionally* order-sensitive (SURVEY.md §1.2), and the
reference mixes in a per-instance seed; we expose ``seed`` explicitly so runs
are reproducible.  Sequential per item (the l-minima store resists
vectorization); intended for reference parity + moderate-scale use inside
``applyInPandas`` over token sequences, not the 10^12-file hot path.
"""

from __future__ import annotations

import numpy as np

from .hashes import combine64, hash_u64, mix64
from .rng import Xoshiro256pp, exp1

U64 = np.uint64


class ProbOrdMinHash2:
    def __init__(self, m: int, l: int = 2, seed: int = 0x5EED):
        assert l < 16, "l < 16 (probordminhash2.rs:61)"
        self.m = m
        self.l = l
        self.seed = seed
        self.g = m / (m - np.arange(1, m, dtype=np.float64))  # g[i-1]=m/(m-i)

    def hash_seq(self, items: np.ndarray, hasher: str = "nohash") -> np.ndarray:
        """Sequence of element ids -> m-slot u64 signature."""
        items = np.asarray(items, dtype=U64)
        n = items.shape[0]
        assert n >= self.l, "data length must be >= l (probordminhash2.rs:245)"
        m, l = self.m, self.l
        id_hash = hash_u64(items, hasher)
        values = np.full((m, l), np.inf)
        indices = np.full((m, l), -1, dtype=np.int64)
        counter: dict[int, int] = {}
        for i in range(n):
            hv = int(id_hash[i])
            occ = counter.get(hv, 0) + 1
            counter[hv] = occ
            # rng seeded by (id_hash, occurrence, instance seed)
            lane_seed = combine64(
                np.array([hv], dtype=U64),
                np.array([occ], dtype=U64),
            ) ^ U64(self.seed)
            rng = Xoshiro256pp(lane_seed)
            x = float(exp1(rng)[0])
            v = np.arange(m, dtype=np.int64)
            nb = 0
            qmax = values[:, l - 1].max()
            while x < qmax:
                u = float(rng.next_f64()[0])
                idx = min(nb + int(u * (m - nb)), m - 1)
                k = v[idx]
                v[idx] = v[nb]
                v[nb] = k
                # insert into the slot's sorted l-minima
                if x < values[k, l - 1]:
                    pos = np.searchsorted(values[k], x)
                    values[k, pos + 1 :] = values[k, pos:-1]
                    indices[k, pos + 1 :] = indices[k, pos:-1]
                    values[k, pos] = x
                    indices[k, pos] = i
                    qmax = values[:, l - 1].max()
                else:
                    break
                if x >= qmax or nb + 1 >= m:
                    break
                x += float(exp1(rng)[0]) * self.g[nb]
                nb += 1
        # combine: per slot, hashes of the l elements in position order
        sig = np.empty(m, dtype=U64)
        for k in range(m):
            pos = np.sort(indices[k])
            assert (pos >= 0).all(), "slot not filled; increase data size or lower m"
            acc = mix64(np.array([self.seed], dtype=U64))
            for p in pos:
                acc = combine64(acc, id_hash[p])
            sig[k] = acc[0]
        return sig
