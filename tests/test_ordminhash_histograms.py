"""ProbOrdMinHash2 match-count distribution acceptance tests, mirroring the
reference's in-comment histogram fixtures (``probordminhash2.rs:454-513``) —
the only reference-embedded numeric corpus obtainable without cargo.

What the fixtures are: the Rust test harness hashes a pattern pair
``nb_iter`` times with a fresh instance seed per iteration and histograms
the number of equal signature slots; the comments record (a) histograms from
Ertl's C++ implementation and (b) the Rust implementation's own runs.

Why exact histogram parity is unreachable — and what we pin instead: the
recorded Ertl-C++ and Rust histograms DISAGREE with each other beyond
sampling noise (pattern3 l=3 means ~2.82 vs ~4.98), so the distribution is
implementation-sensitive.  Root cause on the Rust side: it seeds Xoshiro256++
with RAW state words [id_hash, occurrence, seed, 0]
(``probordminhash2.rs:270-276``) — nearby states of a linear generator yield
correlated early outputs across items sharing words, inflating match counts.
Our kernel SplitMix-mixes the seed into the state (documented deviation), so
its per-item streams are effectively independent.  The acceptance design:

1. pin our kernel's distribution against an INDEPENDENT rng substrate
   (PCG64 per (id, occurrence, seed)) running the same sequential algorithm
   — two unrelated generators agreeing identifies the seeding-independent
   ideal distribution;
2. require our mean to sit inside the implementation-family envelope of the
   recorded fixtures (between Ertl's and the Rust's where both exist;
   within the observed family spread of the Rust's where only it exists),
   and our support to stay inside the fixtures' support envelope.
"""

from bisect import insort  # noqa: F401  (documents the insert-sorted store)
from math import inf

import numpy as np
import pytest

from probminhash_spark.kernels.probordminhash2 import probordminhash2_batch

M = 32
BINS = np.arange(M + 1)

# patterns from probordminhash2.rs:357-390
P2_V1 = [0, 1, 2, 3, 4, 0, 1, 2, 3, 2, 4, 5]
P2_V2 = [0, 1, 2, 6, 4, 0, 7, 1, 2, 3, 2, 4, 5]
P3_V1 = [0, 1, 2, 3, 4, 0, 1, 2, 3, 2, 4, 5, 0, 1, 2, 3, 4, 0, 1, 2, 6, 2, 4, 5]
P3_V2 = P2_V2

# recorded fixtures (comment blocks in probordminhash2.rs:454-513)
RUST_P2_L3 = [0, 0, 7, 23, 103, 347, 1022, 2415, 4579, 7443, 10728, 13314,
              14353, 13844, 11563, 8556, 5604, 3207, 1714, 732, 292, 101, 41, 8, 4]
RUST_P2_L5 = [713, 3520, 9579, 16223, 19522, 18720, 14512, 8965, 4837, 2190,
              817, 277, 95, 25, 4, 0, 1]
ERTL_P3_L3 = [6800, 19111, 25961, 22759, 14462, 6950, 2768, 876, 261, 43, 9]
RUST_P3_L3 = [651, 3392, 8604, 14253, 17917, 17572, 14376, 10012, 6463, 3513,
              1739, 864, 384, 146, 67, 31, 11, 3, 2]
ERTL_P3_L5 = [78348, 19158, 2308, 180, 6]
RUST_P3_L5 = [70282, 24213, 4740, 656, 96, 12, 1]


def _fixture_mean(h):
    h = np.asarray(h, dtype=np.float64)
    return float((np.arange(h.size) * h).sum() / h.sum())


def _flat(docs):
    d = np.concatenate(
        [np.full(len(v), i, dtype=np.int64) for i, v in enumerate(docs)]
    )
    return d, np.concatenate([np.asarray(v, dtype=np.uint64) for v in docs])


def _kernel_hist(v1, v2, l, niter):
    """Every iteration = one (v1, v2) pair under a fresh instance seed —
    vectorized as one batch call via per-doc seeds (the batch analogue of the
    reference harness's change_rng_seed loop)."""
    d, h = _flat([v1, v2] * niter)
    seeds = np.repeat(np.arange(niter, dtype=np.uint64), 2)
    sig = probordminhash2_batch(d, h, 2 * niter, M, l, seeds)
    eq = (sig[0::2] == sig[1::2]).sum(axis=1)
    return np.bincount(eq, minlength=M + 1)


def _ideal_hist(v1, v2, l, niter, salt=12345):
    """The same sequential algorithm (probordminhash2.rs:234-306 semantics:
    per-(id, occurrence, seed) stream, lazy-FY walk, l-minima store, break
    on failed insert / exhausted qmax / nb+1 >= m) on an INDEPENDENT rng
    substrate: one fresh PCG64 per item.  Slot identity = the id sequence at
    position-sorted stored indices (what the hash combine encodes)."""
    hist = np.zeros(M + 1, dtype=np.int64)
    for it in range(niter):
        sigs = []
        for v in (v1, v2):
            vals = [[inf] * l for _ in range(M)]
            idxs = [[-1] * l for _ in range(M)]
            last = [inf] * M
            qmax = inf
            counter: dict[int, int] = {}
            for i, idval in enumerate(v):
                occ = counter.get(idval, 0) + 1
                counter[idval] = occ
                rng = np.random.default_rng((idval, occ, it, salt))
                x = rng.exponential()
                perm = list(range(M))
                nb = 0
                while x < qmax:
                    u = rng.random()
                    idx = min(nb + int(u * (M - nb)), M - 1)
                    k = perm[idx]
                    perm[idx] = perm[nb]
                    perm[nb] = k
                    row = vals[k]
                    if x < row[l - 1]:
                        j = l - 1
                        while j > 0 and x < row[j - 1]:
                            row[j] = row[j - 1]
                            idxs[k][j] = idxs[k][j - 1]
                            j -= 1
                        row[j] = x
                        idxs[k][j] = i
                        last[k] = row[l - 1]
                        qmax = max(last)
                    else:
                        break
                    if x >= qmax or nb + 1 >= M:
                        break
                    x += rng.exponential() * M / (M - (nb + 1))
                    nb += 1
            sigs.append(
                [tuple(v[p] for p in sorted(idxs[k])) for k in range(M)]
            )
        hist[sum(1 for k in range(M) if sigs[0][k] == sigs[1][k])] += 1
    return hist


def _tv(h1, h2):
    p = h1 / h1.sum()
    q = np.zeros_like(p)
    q[: len(h2)] = np.asarray(h2, dtype=np.float64)
    q = q / q.sum()
    return 0.5 * float(np.abs(p - q).sum())


@pytest.mark.parametrize(
    "name,v1,v2,l",
    [("p2_l3", P2_V1, P2_V2, 3), ("p3_l3", P3_V1, P3_V2, 3)],
)
def test_kernel_matches_independent_substrate(name, v1, v2, l):
    """Two unrelated rng substrates (our Xoshiro+SplitMix seeding vs PCG64)
    must agree on the match-count distribution — the seeding-independent
    ideal the algorithm defines."""
    hk = _kernel_hist(v1, v2, l, 8000)
    hi = _ideal_hist(v1, v2, l, 1500)
    mk = _fixture_mean(hk)
    mi = _fixture_mean(hi)
    sd = np.sqrt(((np.arange(M + 1) - mi) ** 2 * hi / hi.sum()).sum())
    tol = 5 * sd * np.sqrt(1 / 8000 + 1 / 1500)
    assert abs(mk - mi) < tol, (name, mk, mi, tol)
    assert _tv(hk, hi) < 0.10, (name, _tv(hk, hi))


@pytest.mark.parametrize(
    "name,v1,v2,l,fixtures",
    [
        ("p2_l3", P2_V1, P2_V2, 3, [RUST_P2_L3]),
        ("p2_l5", P2_V1, P2_V2, 5, [RUST_P2_L5]),
        ("p3_l3", P3_V1, P3_V2, 3, [ERTL_P3_L3, RUST_P3_L3]),
        ("p3_l5", P3_V1, P3_V2, 5, [ERTL_P3_L5, RUST_P3_L5]),
    ],
)
def test_kernel_within_reference_fixture_envelope(name, v1, v2, l, fixtures):
    """Our distribution must sit inside the implementation-family envelope
    of the recorded fixtures: mean within [min, max] of the recorded
    implementations (widened by the ~30% family spread they exhibit against
    each other), support inside the fixtures' support + slack."""
    h = _kernel_hist(v1, v2, l, 8000)
    mean = _fixture_mean(h)
    f_means = [_fixture_mean(f) for f in fixtures]
    lo, hi = min(f_means) * 0.70, max(f_means) * 1.30
    assert lo <= mean <= hi, (name, mean, f_means)
    # support: mass beyond the widest fixture support must be negligible
    max_support = max(len(f) for f in fixtures)
    tail = h[max_support + 2 :].sum() / h.sum()
    assert tail < 0.01, (name, tail)
    # where both implementations are recorded and agree in shape (p3_l5),
    # we agree too
    if name == "p3_l5":
        assert _tv(h, fixtures[1]) < 0.06, _tv(h, fixtures[1])


def test_pattern_similarity_ordering():
    """Cross-pattern sanity the fixtures also exhibit: the p2 pair is more
    similar than the p3 pair (more equal slots), and raising l lowers match
    counts for both."""
    m_p2_l3 = _fixture_mean(_kernel_hist(P2_V1, P2_V2, 3, 4000))
    m_p3_l3 = _fixture_mean(_kernel_hist(P3_V1, P3_V2, 3, 4000))
    m_p2_l5 = _fixture_mean(_kernel_hist(P2_V1, P2_V2, 5, 4000))
    m_p3_l5 = _fixture_mean(_kernel_hist(P3_V1, P3_V2, 5, 4000))
    assert m_p2_l3 > m_p3_l3 > m_p3_l5
    assert m_p2_l3 > m_p2_l5 > m_p3_l5
