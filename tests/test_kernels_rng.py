"""RNG / hash primitive tests — mirrors the reference's mechanism tests
(``exp01.rs:96-130``, ``fyshuffle.rs:85-116``, ``invhash.rs:111-140``)."""

import numpy as np
import pytest

from probminhash_spark.kernels.hashes import (
    fnv1a64_bytes,
    fnv1a64_u64,
    wang64,
    wang64_inverse,
)
from probminhash_spark.kernels.rng import ExpRestricted01, Xoshiro256pp, splitmix64_stream

U64 = np.uint64


def _splitmix64_scalar(seed: int, n: int) -> list[int]:
    """Independent scalar transcription of Steele et al.'s published SplitMix64
    (guards the vectorized implementation against broadcasting bugs)."""
    M = (1 << 64) - 1
    out = []
    s = seed & M
    for _ in range(n):
        s = (s + 0x9E3779B97F4A7C15) & M
        z = s
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M
        out.append(z ^ (z >> 31))
    return out


def test_splitmix64_matches_scalar_reference():
    for seed in (0, 1, 1234567, (1 << 64) - 1):
        out = splitmix64_stream(np.array([seed], dtype=U64), 5)[0]
        assert out.tolist() == _splitmix64_scalar(seed, 5)


def test_xoshiro_lanes_independent_and_deterministic():
    seeds = np.arange(16, dtype=np.int64).astype(U64)
    a = Xoshiro256pp(seeds)
    b = Xoshiro256pp(seeds)
    for _ in range(10):
        assert np.array_equal(a.next_u64(), b.next_u64())
    # a lane equals running it standalone
    solo = Xoshiro256pp(np.array([7], dtype=U64))
    lane = Xoshiro256pp(seeds)
    for _ in range(5):
        assert solo.next_u64()[0] == lane.next_u64()[7]


def test_masked_advance_preserves_stream():
    seeds = np.arange(4, dtype=U64)
    rng = Xoshiro256pp(seeds)
    mask = np.array([True, False, True, False])
    x1 = rng.next_u64(mask)
    x2 = rng.next_u64()
    ref = Xoshiro256pp(seeds)
    r1 = ref.next_u64()
    r2 = ref.next_u64()
    # masked lanes got x1 = first draw; unmasked lanes' first draw arrives at x2
    assert x1[0] == r1[0] and x1[2] == r1[2]
    assert x2[1] == r1[1] and x2[3] == r1[3]
    assert x2[0] == r2[0] and x2[2] == r2[2]


def test_next_f64_in_unit_interval_and_uniform():
    rng = Xoshiro256pp(np.arange(200_000, dtype=U64))
    x = rng.next_f64()
    assert (x >= 0).all() and (x < 1).all()
    assert abs(x.mean() - 0.5) < 3 * np.sqrt(1 / 12 / x.size)


def test_next_below_bounds_and_uniform():
    rng = Xoshiro256pp(np.arange(300_000, dtype=U64))
    m = 97
    k = rng.next_below(m)
    assert (k < m).all()
    counts = np.bincount(k.astype(np.int64), minlength=m)
    expected = k.size / m
    sigma = np.sqrt(k.size * (1 / m) * (1 - 1 / m))
    assert np.abs(counts - expected).max() < 5 * sigma


def test_next_in_range_per_lane_low():
    rng = Xoshiro256pp(np.arange(10_000, dtype=U64))
    low = np.arange(10_000, dtype=np.int64) % 50
    k = rng.next_in_range(low, 64)
    assert (k.astype(np.int64) >= low).all() and (k < 64).all()


def test_exp01_mean_matches_reference_formula():
    # mirrors exp01.rs:96-130: lambda=0.5, mu_th from the truncated-exp mean
    lam = 0.5
    mu_th = -lam * np.exp(-lam) - np.expm1(-lam)
    mu_th /= -lam * np.expm1(-lam)
    rng = Xoshiro256pp(np.arange(2_000_000, dtype=U64))
    s = ExpRestricted01(lam).sample(rng)
    assert (s >= 0).all() and (s < 1).all()
    test = (mu_th - s.mean()) / (s.std(ddof=1) / np.sqrt(s.size))
    assert abs(test) < 3.0


def test_exp01_distribution_ks():
    lam = np.log(128 / 127.0)  # the lambda ProbMinHash3 uses at m=128
    rng = Xoshiro256pp(np.arange(500_000, dtype=U64))
    s = np.sort(ExpRestricted01(lam).sample(rng))
    cdf = -np.expm1(-lam * s) / -np.expm1(-lam)
    emp = np.arange(1, s.size + 1) / s.size
    assert np.abs(cdf - emp).max() < 2.5 / np.sqrt(s.size)


def test_wang64_invertible_roundtrip():
    # invhash.rs:111-140 does 10^6 round trips; vectorized here
    v = np.random.default_rng(42).integers(0, 2**63, size=1_000_000).astype(U64)
    assert np.array_equal(wang64_inverse(wang64(v)), v)


def test_fnv1a64_matches_bytes_reference():
    vals = np.array([0, 1, 2, 12345, 2**63 + 17], dtype=U64)
    vec = fnv1a64_u64(vals)
    for i, v in enumerate(vals.tolist()):
        assert vec[i] == fnv1a64_bytes(int(v).to_bytes(8, "little"))


@pytest.mark.parametrize("m", [2, 64, 4096])
def test_next_below_edge_sizes(m):
    rng = Xoshiro256pp(np.arange(1000, dtype=U64))
    k = rng.next_below(m)
    assert (k < m).all()
