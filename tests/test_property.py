"""Property-based tests (hypothesis) for the kernel layer."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from probminhash_spark.kernels.densminhash import optdens_minhash_batch
from probminhash_spark.kernels.probminhash import probminhash3a_batch
from probminhash_spark.kernels.rng import Xoshiro256pp
from probminhash_spark.kernels.shingles import char_shingles, dedupe_counts, token_shingles

U64 = np.uint64

texts_strategy = st.lists(
    st.text(
        alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
        max_size=200,
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=30, deadline=None)
@given(texts=texts_strategy, k=st.integers(2, 12))
def test_char_shingles_counts_and_determinism(texts, k):
    d1, h1 = char_shingles(texts, k)
    d2, h2 = char_shingles(texts, k)
    assert np.array_equal(d1, d2) and np.array_equal(h1, h2)
    # every non-empty doc contributes >= 1 shingle; empty docs contribute 1
    # whole-content shingle (len<k branch) unless text encodes to 0 bytes
    for i, t in enumerate(texts):
        n_bytes = len(t.encode("utf-8", "surrogatepass"))
        expected = max(n_bytes - k + 1, 1)
        assert (d1 == i).sum() == expected


@settings(max_examples=30, deadline=None)
@given(texts=texts_strategy, w=st.integers(1, 5))
def test_token_shingles_doc_isolation(texts, w):
    """Shingles of a doc are independent of its neighbors in the batch."""
    d_all, h_all = token_shingles(texts, w)
    for i, t in enumerate(texts):
        d_solo, h_solo = token_shingles([t], w)
        assert sorted(h_all[d_all == i].tolist()) == sorted(h_solo.tolist())


@settings(max_examples=20, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 2**63)), min_size=1, max_size=200
    )
)
def test_dedupe_counts_matches_pandas(pairs):
    import pandas as pd

    doc = np.array([p[0] for p in pairs], dtype=np.int64)
    h = np.array([p[1] for p in pairs], dtype=np.uint64)
    d, u, c = dedupe_counts(doc, h)
    oracle = (
        pd.DataFrame({"d": doc, "h": h})
        .groupby(["d", "h"])
        .size()
        .reset_index(name="n")
        .sort_values(["d", "h"])
    )
    assert d.tolist() == oracle["d"].tolist()
    assert u.tolist() == oracle["h"].tolist()
    assert c.tolist() == oracle["n"].tolist()


@settings(max_examples=15, deadline=None)
@given(
    items=st.lists(st.integers(0, 2**63), min_size=1, max_size=60, unique=True),
    m=st.sampled_from([2, 8, 64]),
    seed=st.integers(0, 1000),
)
def test_probminhash3a_order_invariance(items, m, seed):
    arr = np.array(items, dtype=U64)
    w = np.random.default_rng(seed).uniform(0.5, 5.0, arr.size)
    doc = np.zeros(arr.size, dtype=np.int64)
    s1, v1 = probminhash3a_batch(doc, arr, w, 1, m)
    perm = np.random.default_rng(seed + 1).permutation(arr.size)
    s2, v2 = probminhash3a_batch(doc, arr[perm], w[perm], 1, m)
    assert np.array_equal(s1, s2)
    assert np.array_equal(v1, v2)


@settings(max_examples=15, deadline=None)
@given(
    items=st.lists(st.integers(0, 2**63), min_size=1, max_size=100),
    m=st.sampled_from([4, 32]),
)
def test_optdens_duplicate_invariance(items, m):
    """Duplicates must not change the sketch (idempotent min-reduce)."""
    arr = np.array(items, dtype=U64)
    uniq = np.unique(arr)
    v1, w1 = optdens_minhash_batch(np.zeros(arr.size, np.int64), arr, 1, m)
    v2, w2 = optdens_minhash_batch(np.zeros(uniq.size, np.int64), uniq, 1, m)
    assert np.array_equal(v1, v2) and np.array_equal(w1, w2)


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(0, 2**63), bound=st.integers(1, 2**40))
def test_lemire_bounded_int_matches_scalar(seed, bound):
    """Vectorized Lemire rejection == scalar reference implementation."""
    rng = Xoshiro256pp(np.array([seed], dtype=U64))
    got = [int(rng.next_below(bound)[0]) for _ in range(4)]
    # scalar re-derivation from the same stream
    rng2 = Xoshiro256pp(np.array([seed], dtype=U64))
    M = (1 << 64) - 1
    thresh = ((M + 1) - bound) % bound
    exp = []
    for _ in range(4):
        while True:
            x = int(rng2.next_u64()[0])
            prod = x * bound
            if (prod & M) >= thresh:
                exp.append(prod >> 64)
                break
    assert got == exp


@settings(max_examples=40, deadline=None)
@given(
    msgs=st.lists(st.binary(min_size=0, max_size=400), min_size=1, max_size=20)
)
def test_sha512_256_raw_matches_hashlib(msgs):
    """The vectorized SHA-512/256 is bit-identical to hashlib for arbitrary
    byte messages (any length/padding regime hypothesis finds)."""
    import hashlib

    from probminhash_spark.kernels.hashes import sha512_256_raw

    buf = np.frombuffer(b"".join(msgs), dtype=np.uint8)
    lens = np.array([len(m) for m in msgs], dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    got = sha512_256_raw(buf, starts, lens)
    exp = np.stack(
        [
            np.frombuffer(hashlib.new("sha512_256", m).digest(), "<u8")
            for m in msgs
        ]
    )
    assert (got == exp).all()


@settings(max_examples=25, deadline=None)
@given(
    spans_texts=st.lists(
        st.text(
            alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
            max_size=120,
        ),
        min_size=1,
        max_size=8,
    ),
    k=st.integers(2, 10),
)
def test_char_shingle_spans_slice_to_their_hash_preimage(spans_texts, k):
    """Span plumbing invariant: every returned (start, len) slices out of the
    flat buffer exactly the bytes whose polynomial hash the kernel computed —
    re-hashing the slice as a standalone doc reproduces the hash."""
    from probminhash_spark.kernels.shingles import char_shingles

    d, h, s, ln, buf = char_shingles(spans_texts, k, return_spans=True)
    for i in np.random.default_rng(0).permutation(len(h))[:25]:
        piece = bytes(buf[s[i] : s[i] + ln[i]])
        _, h2 = char_shingles([piece], max(k, len(piece) or 1) if len(piece) < k else k)
        # the slice hashes to the same value when shingled whole
        _, h3 = char_shingles([piece], k)
        assert h[i] in set(h3.tolist()), i


@settings(max_examples=40, deadline=None)
@given(texts=texts_strategy, w=st.integers(1, 4))
def test_token_shingle_canonical_spans_match_python_join(texts, w):
    """r4 canonical-key invariant: every returned (start, len) slices the
    canonical buffer to exactly the window's tokens joined by 0x00 — the
    byte key a python re-tokenization computes independently.  Exercises
    the vectorized scatter-copy (cumsum offsets, short-doc windows,
    multi-byte tokens) against a per-doc oracle."""
    import re

    d, h, s, ln, canon = token_shingles(texts, w, return_spans=True)
    got_by_doc: dict[int, list[bytes]] = {}
    for i in range(len(h)):
        got_by_doc.setdefault(int(d[i]), []).append(bytes(canon[s[i] : s[i] + ln[i]]))
    for i, t in enumerate(texts):
        toks = re.findall(rb"[A-Za-z0-9_\x80-\xff]+", t.encode("utf-8", "surrogatepass"))
        if not toks:
            assert i not in got_by_doc
            continue
        if len(toks) < w:
            expect = [b"\x00".join(toks)]
        else:
            expect = [b"\x00".join(toks[j : j + w]) for j in range(len(toks) - w + 1)]
        assert sorted(got_by_doc.get(i, [])) == sorted(expect), (i, t)
