"""Shingling correctness: vectorized hashes must equal a straightforward
per-document reference computation."""

import numpy as np

from probminhash_spark.kernels.hashes import mix64
from probminhash_spark.kernels.shingles import (
    char_shingles,
    dedupe_counts,
    token_hashes,
    token_shingles,
)

U64 = np.uint64
P = 0x100000001B3
M64 = (1 << 64) - 1


def _poly(bs: bytes, offset: int = 0) -> int:
    h = 0
    for i, b in enumerate(bs):
        h = (h + (b + offset) * pow(P, i, 1 << 64)) & M64
    return h


def _mix_scalar(x: int) -> int:
    return int(mix64(np.array([x], dtype=U64))[0])


def test_char_shingles_match_scalar():
    docs = ["abcdef", "xyz", "abcdef"]
    k = 3
    doc_idx, hashes = char_shingles(docs, k)
    got = {}
    for d, h in zip(doc_idx.tolist(), hashes.tolist()):
        got.setdefault(d, []).append(h)
    for di, text in enumerate(docs):
        bs = text.encode()
        # offset=1: char grams hash (byte+1) so NUL bytes are distinguishable
        expected = [
            _mix_scalar(_poly(bs[i : i + k], offset=1)) for i in range(len(bs) - k + 1)
        ]
        assert sorted(got[di]) == sorted(expected)
    # identical docs -> identical shingle multisets
    assert sorted(got[0]) == sorted(got[2])


def test_char_shingles_short_doc_whole_content():
    doc_idx, hashes = char_shingles(["ab", "abcdefgh"], 5)
    assert (doc_idx == 0).sum() == 1  # one whole-content shingle
    assert (doc_idx == 1).sum() == 4


def test_char_shingles_no_cross_doc_windows():
    d1, h1 = char_shingles(["aaaa", "bbbb"], 3)
    d2a, h2a = char_shingles(["aaaa"], 3)
    d2b, h2b = char_shingles(["bbbb"], 3)
    assert sorted(h1[d1 == 0].tolist()) == sorted(h2a.tolist())
    assert sorted(h1[d1 == 1].tolist()) == sorted(h2b.tolist())


def test_token_hashes_equivalence():
    docs = ["foo bar_baz 123", "foo;bar_baz-123", "  foo  "]
    di, th = token_hashes(docs)
    toks = {}
    for d, h in zip(di.tolist(), th.tolist()):
        toks.setdefault(d, []).append(h)
    # same token -> same hash across docs and positions
    assert toks[0][0] == toks[1][0] == toks[2][0]  # 'foo'
    assert toks[0][1] == toks[1][1]  # 'bar_baz'
    assert toks[0][2] == toks[1][2]  # '123'
    assert len(toks[0]) == 3 and len(toks[2]) == 1


def test_token_shingles_windows():
    di, sh = token_shingles(["a b c d", "a b c d", "x y"], 3)
    a = sorted(sh[di == 0].tolist())
    b = sorted(sh[di == 1].tolist())
    assert a == b and len(a) == 2  # (a b c), (b c d)
    assert (di == 2).sum() == 1  # short doc -> whole-token-seq shingle


def test_dedupe_counts():
    doc = np.array([0, 0, 0, 1, 1], dtype=np.int64)
    h = np.array([7, 7, 9, 7, 7], dtype=U64)
    d, u, c = dedupe_counts(doc, h)
    assert d.tolist() == [0, 0, 1]
    assert u.tolist() == [7, 9, 7]
    assert c.tolist() == [2, 1, 2]


def test_unicode_content_roundtrips():
    di, h = char_shingles(["héllo wörld", "héllo wörld"], 4)
    assert sorted(h[di == 0].tolist()) == sorted(h[di == 1].tolist())


def test_nul_bytes_distinguishable():
    # 'a' vs 'a\x00\x00': trailing NULs must change the whole-content shingle
    di, h = char_shingles(["a", "a\x00\x00", "a\x00", "\x00a"], 8)
    assert len(set(h.tolist())) == 4
    # and inside k-grams too
    di2, h2 = char_shingles(["ab\x00cdefgh", "ab\x00\x00cdefgh"], 8)
    assert set(h2[di2 == 0].tolist()) != set(h2[di2 == 1].tolist())
