"""Tests for the remaining sketch families: ProbMinHash2, ProbOrdMinHash2,
RevOptDensMinHash — mirroring the reference's own test designs."""

import numpy as np

from probminhash_spark.kernels.densminhash import revoptdens_minhash_batch
from probminhash_spark.kernels.jaccard import exact_weighted_jaccard, sigma, sketch_jaccard
from probminhash_spark.kernels.probminhash2 import probminhash2_batch, probminhash2_single
from probminhash_spark.kernels.probminhash import probminhash3a_single
from probminhash_spark.kernels.probordminhash2 import ProbOrdMinHash2

U64 = np.uint64
VA = np.arange(0, 1000, dtype=np.int64).astype(U64)
VB = np.arange(900, 2000, dtype=np.int64).astype(U64)
J_AB = 100 / 2000


def test_probminhash2_equal_weights_jaccard():
    # probminhash2.rs:158-233 analogue
    m = 1000
    siga, _ = probminhash2_single(VA, np.full(VA.size, 10.0), m)
    sigb, _ = probminhash2_single(VB, np.full(VB.size, 10.0), m)
    jhat = sketch_jaccard(siga, sigb)
    assert abs(jhat - J_AB) < 3 * sigma(J_AB, m)


def test_probminhash2_weighted_jp():
    # probminhash2.rs:236-309 analogue: wa=2i (i<70), wb=i^4 (i>=50)
    m = 2000
    ia = np.arange(1, 70, dtype=np.int64)
    wa = 2.0 * ia
    ib = np.arange(50, 100, dtype=np.int64)
    wb = ib.astype(np.float64) ** 4
    jp = exact_weighted_jaccard(
        dict(zip(ia.tolist(), wa.tolist())), dict(zip(ib.tolist(), wb.tolist()))
    )
    siga, _ = probminhash2_single(ia.astype(U64), wa, m)
    sigb, _ = probminhash2_single(ib.astype(U64), wb, m)
    jhat = sketch_jaccard(siga, sigb)
    assert abs(jhat - jp) < 3 * sigma(jp, m)


def test_probminhash2_agrees_with_3a():
    """Both estimate the same J_p on the same input (independent algorithms)."""
    m = 1500
    ia = np.arange(1, 101, dtype=np.int64).astype(U64)
    w = np.linspace(1.0, 5.0, 100)
    s2, _ = probminhash2_single(ia, w, m)
    s3, _ = probminhash3a_single(ia, w, m)
    # self-similarity across algorithms is meaningless; compare their
    # J estimates on a perturbed copy
    ib = ia.copy()
    ib[:30] += U64(10_000)
    t2, _ = probminhash2_single(ib, w, m)
    t3, _ = probminhash3a_single(ib, w, m)
    j2 = sketch_jaccard(s2, t2)
    j3 = sketch_jaccard(s3, t3)
    assert abs(j2 - j3) < 6 * sigma(max(j2, j3, 0.01), m)


def test_probminhash2_batch_orderfree():
    m = 256
    ia = np.arange(1, 71, dtype=np.int64).astype(U64)
    wa = np.linspace(1, 10, 70)
    s1, v1 = probminhash2_single(ia, wa, m)
    perm = np.random.default_rng(0).permutation(70)
    s2, v2 = probminhash2_single(ia[perm], wa[perm], m)
    assert np.array_equal(s1, s2) and np.array_equal(v1, v2)


def test_probordminhash2_order_sensitivity_and_determinism():
    pom = ProbOrdMinHash2(m=64, l=2, seed=123)
    seq = np.arange(100, dtype=np.int64).astype(U64)
    s1 = pom.hash_seq(seq)
    s2 = pom.hash_seq(seq)
    assert np.array_equal(s1, s2), "deterministic for fixed seed"
    # reversed sequence must give a very different signature (order matters)
    s3 = pom.hash_seq(seq[::-1].copy())
    assert np.mean(s1 == s3) < 0.2
    # small perturbation -> high similarity (edit-distance LSH property,
    # probordminhash2.rs:332-344)
    seq4 = seq.copy()
    seq4[50] = U64(9999)
    s4 = pom.hash_seq(seq4)
    assert np.mean(s1 == s4) > 0.6


def test_probordminhash2_duplicates_distinguished():
    """Repeated elements use occurrence counters (probordminhash2.rs:253-266):
    sequences with different repetition patterns must differ."""
    pom = ProbOrdMinHash2(m=32, l=3, seed=7)
    rng = np.random.default_rng(5)
    base = rng.integers(0, 1000, 120).astype(U64)
    a = base
    b = base.copy()
    b[::2] = base[::2][::-1]  # same multiset, scrambled order
    sa, sb = pom.hash_seq(a), pom.hash_seq(b)
    assert not np.array_equal(sa, sb)
    assert np.mean(sa == sb) < 0.6


def test_revoptdens_small_sets_3sigma():
    """m >> set size is RevOptDens's regime (densminhash.rs:36-38)."""
    m = 1024
    va = np.arange(0, 100, dtype=np.int64).astype(U64)
    vb = np.arange(90, 200, dtype=np.int64).astype(U64)
    j = 10 / 200
    doc = np.concatenate([np.zeros(va.size, np.int64), np.ones(vb.size, np.int64)])
    items = np.concatenate([va, vb])
    vals, win = revoptdens_minhash_batch(doc, items, 2, m, hasher="fnv1a64")
    assert (vals < float(np.uint32(0xFFFFFFFF))).all(), "all bins densified"
    jhat = float(np.mean(win[0] == win[1]))
    assert abs(jhat - j) < 5 * sigma(j, m)


def test_superminhash2_range_fixture_3sigma():
    # superminhasher2.rs:337-373 analogue: J = 0.05 range fixture
    from probminhash_spark.kernels.superminhash import superminhash2_batch

    m = 1500
    doc = np.concatenate([np.zeros(VA.size, np.int64), np.ones(VB.size, np.int64)])
    items = np.concatenate([VA, VB])
    J, R, win = superminhash2_batch(doc, items, 2, m, hasher="fnv1a64")
    jhat = float(np.mean(win[0] == win[1]))
    assert abs(jhat - J_AB) < 3 * sigma(J_AB, m)
    # winner equality must coincide with (level, r) state equality
    state_eq = (J[0] == J[1]) & (R[0] == R[1])
    assert np.array_equal(win[0] == win[1], state_eq)


def test_superminhash2_chunking_invariant():
    from probminhash_spark.kernels.superminhash import superminhash2_batch

    m = 64
    doc = np.zeros(VA.size, np.int64)
    a = superminhash2_batch(doc, VA, 1, m, lanes_per_chunk=37)
    b = superminhash2_batch(doc, VA, 1, m, lanes_per_chunk=100000)
    for x, y in zip(a, b):
        assert np.array_equal(x, y)


def test_probminhash3a_sha_byte_keys_jp():
    """S6 / probminhash3sha.rs:297-367: byte keys (random blobs), weighted
    J_p within 3 sigma of the exact double-loop oracle."""
    from probminhash_spark.kernels.probminhash import probminhash3a_sha_single

    m = 1200
    rng = np.random.default_rng(8)
    blobs = [rng.bytes(256) for _ in range(100)]
    wa = {i: 2.0 * i for i in range(1, 70)}
    wb = {i: float(i) ** 4 for i in range(50, 100)}
    siga, _ = probminhash3a_sha_single(
        [blobs[i] for i in sorted(wa)], np.array([wa[i] for i in sorted(wa)]), m
    )
    sigb, _ = probminhash3a_sha_single(
        [blobs[i] for i in sorted(wb)], np.array([wb[i] for i in sorted(wb)]), m
    )
    jp = exact_weighted_jaccard(wa, wb)
    jhat = sketch_jaccard(siga, sigb)
    assert abs(jhat - jp) < 3 * sigma(jp, m)


def test_probminhash3a_sha_batch_equals_single():
    """hasher='sha' batch path (S6) must reproduce the single-set sha kernel
    exactly: same digest-seeded rng states, same first-digest-word identity."""
    import numpy as np

    from probminhash_spark.kernels.probminhash import (
        probminhash3a_batch,
        probminhash3a_sha_single,
    )

    rng = np.random.default_rng(77)
    m = 16
    sigs_single, sigs_batch = [], None
    docs, keys, weights = [], [], []
    for d in range(5):
        n = int(rng.integers(3, 40))
        k = rng.integers(0, 1 << 63, n, dtype=np.int64).astype(np.uint64)
        w = rng.uniform(0.2, 5.0, n)
        byte_keys = [int(x).to_bytes(8, "little") for x in k]
        s, _ = probminhash3a_sha_single(byte_keys, w, m)
        sigs_single.append(s)
        docs.append(np.full(n, d, dtype=np.int64))
        keys.append(k)
        weights.append(w)
    sig_b, _ = probminhash3a_batch(
        np.concatenate(docs),
        np.concatenate(keys),
        np.concatenate(weights),
        5,
        m,
        hasher="sha",
    )
    for d in range(5):
        assert sig_b[d].tolist() == sigs_single[d].tolist(), d


def test_sha_states_dedup_and_cache():
    import numpy as np

    from probminhash_spark.kernels.hashes import sha512_256_states

    keys = np.array([7, 7, 9, 7], dtype=np.uint64)
    states, ident = sha512_256_states(keys)
    assert states.shape == (4, 4)
    assert ident[0] == ident[1] == ident[3] != ident[2]
    import hashlib

    d = hashlib.new("sha512_256", (7).to_bytes(8, "little")).digest()
    assert states[0].tolist() == np.frombuffer(d, dtype="<u8").tolist()
    # second call hits the cache, same result
    states2, _ = sha512_256_states(keys)
    assert states2.tolist() == states.tolist()


def test_probordminhash2_batch_equals_sequential():
    """The cross-doc vectorized kernel must reproduce hash_seq exactly
    (same rng streams, same l-minima evolution, same combine chain)."""
    import numpy as np

    from probminhash_spark.kernels.probordminhash2 import (
        ProbOrdMinHash2,
        probordminhash2_batch,
    )

    rng = np.random.default_rng(123)
    m, l, seed = 16, 2, 0x5EED
    docs, hashes, expect = [], [], []
    pom = ProbOrdMinHash2(m=m, l=l, seed=seed)
    for d in range(12):
        n = int(rng.integers(l, 120))
        # repeated items exercise the occurrence counter
        seq = rng.integers(0, 30, n, dtype=np.int64).astype(np.uint64)
        expect.append(pom.hash_seq(seq))
        docs.append(np.full(n, d, dtype=np.int64))
        hashes.append(seq)
    got = probordminhash2_batch(
        np.concatenate(docs), np.concatenate(hashes), 12, m, l, seed
    )
    for d in range(12):
        assert got[d].tolist() == expect[d].tolist(), d
