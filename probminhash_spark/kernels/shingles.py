"""Fully vectorized shingling of document batches.

The reference consumes (weighted) sets of hashable objects; for the dedup
pipeline those objects are *shingles* of file content (char k-grams or token
w-shingles), reduced to u64 hashes and fed to the sketchers through the
pre-hashed fast path (``nohasher.rs:10-48`` — "values already hashed").

Everything here operates on a whole Arrow batch at once: documents are
concatenated into one uint8 buffer and shingle hashes are computed with
wrapping polynomial prefix sums — zero per-row Python, per the north rule.
"""

from __future__ import annotations

import numpy as np

from .hashes import mix64

U64 = np.uint64
_err = dict(over="ignore", under="ignore")

# odd multiplier => invertible mod 2^64
_P = U64(0x100000001B3)
_P_INV = U64(pow(0x100000001B3, -1, 1 << 64))


def _flatten(texts) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Concatenate utf-8 docs -> (byte buffer, per-byte doc idx, doc offsets)."""
    enc = [t.encode("utf-8", "surrogatepass") if isinstance(t, str) else bytes(t) for t in texts]
    lens = np.fromiter((len(e) for e in enc), dtype=np.int64, count=len(enc))
    offsets = np.zeros(len(enc) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    buf = np.frombuffer(b"".join(enc), dtype=np.uint8)
    doc_of_byte = np.repeat(np.arange(len(enc), dtype=np.int64), lens)
    return buf, doc_of_byte, offsets


def _poly_powers(n: int) -> tuple[np.ndarray, np.ndarray]:
    pw = np.empty(n + 1, dtype=U64)
    pw_inv = np.empty(n + 1, dtype=U64)
    pw[0] = U64(1)
    pw_inv[0] = U64(1)
    with np.errstate(**_err):
        np.multiply.accumulate(np.full(n, _P, dtype=U64), out=pw[1:])
        np.multiply.accumulate(np.full(n, _P_INV, dtype=U64), out=pw_inv[1:])
    return pw, pw_inv


def char_shingles(
    texts, k: int, return_spans: bool = False
) -> tuple[np.ndarray, ...]:
    """All char k-gram hashes of a batch -> (doc_idx int64, hash u64).

    Windows never cross document boundaries.  Documents shorter than ``k``
    contribute a single whole-content shingle so no row is silently dropped.

    With ``return_spans`` also returns (span_start, span_len, buf): the raw
    utf-8 byte slice each shingle hashes — the byte-key identity the
    ProbMinHash3aSha regime digests (``sig.rs:12-15``).
    """
    buf, doc_of_byte, offsets = _flatten(texts)
    n = buf.shape[0]
    ndocs = offsets.shape[0] - 1
    if n == 0:
        # all-empty batch: each doc still gets its whole-content (empty)
        # shingle, consistent with the len<k branch below
        d = np.arange(ndocs, dtype=np.int64)
        h = mix64(np.zeros(ndocs, dtype=U64))
        if return_spans:
            z = np.zeros(ndocs, dtype=np.int64)
            return d, h, z, z.copy(), buf
        return d, h
    pw, pw_inv = _poly_powers(n)
    with np.errstate(**_err):
        # byte+1 so NUL bytes contribute (a doc 'a' and 'a\x00\x00' must not
        # collide on whole-content shingles), matching token_hashes
        contrib = (buf.astype(U64) + U64(1)) * pw[:n]
        prefix = np.zeros(n + 1, dtype=U64)
        np.cumsum(contrib, out=prefix[1:])  # wraps mod 2^64
    starts_all = np.arange(n - k + 1, dtype=np.int64) if n >= k else np.empty(0, np.int64)
    if starts_all.size:
        same_doc = doc_of_byte[starts_all] == doc_of_byte[starts_all + k - 1]
        starts = starts_all[same_doc]
        with np.errstate(**_err):
            win = (prefix[starts + k] - prefix[starts]) * pw_inv[starts]
        hashes = mix64(win)
        doc_idx = doc_of_byte[starts]
        span_len = np.full(starts.size, k, dtype=np.int64)
    else:
        hashes = np.empty(0, dtype=U64)
        doc_idx = np.empty(0, dtype=np.int64)
        starts = np.empty(0, dtype=np.int64)
        span_len = np.empty(0, dtype=np.int64)
    # short docs (len < k): one whole-content shingle
    lens = offsets[1:] - offsets[:-1]
    short = np.nonzero(lens < k)[0]
    if short.size:
        s, e = offsets[short], offsets[short + 1]
        with np.errstate(**_err):
            win = (prefix[e] - prefix[s]) * pw_inv[s]
        hashes = np.concatenate([hashes, mix64(win)])
        doc_idx = np.concatenate([doc_idx, short])
        starts = np.concatenate([starts, s])
        span_len = np.concatenate([span_len, e - s])
    if return_spans:
        return doc_idx, hashes, starts, span_len, buf
    return doc_idx, hashes


def token_hashes(texts, return_spans: bool = False) -> tuple[np.ndarray, ...]:
    """Hash every ``[A-Za-z0-9_]+`` token of a batch -> (doc_idx, hash).

    With ``return_spans`` also returns (tok_start, tok_end, buf): byte spans
    of each token in the flattened utf-8 buffer."""
    buf, doc_of_byte, offsets = _flatten(texts)
    n = buf.shape[0]
    if n == 0:
        e = np.empty(0, dtype=np.int64)
        if return_spans:
            return e, np.empty(0, dtype=U64), e.copy(), e.copy(), buf
        return e, np.empty(0, dtype=U64)
    is_word = (
        ((buf >= 0x30) & (buf <= 0x39))
        | ((buf >= 0x41) & (buf <= 0x5A))
        | ((buf >= 0x61) & (buf <= 0x7A))
        | (buf == 0x5F)
        | (buf >= 0x80)  # keep non-ascii bytes inside tokens
    )
    # a token breaks at doc boundaries too
    prev_word = np.empty(n, dtype=bool)
    prev_word[0] = False
    prev_word[1:] = is_word[:-1] & (doc_of_byte[1:] == doc_of_byte[:-1])
    starts_mask = is_word & ~prev_word
    tok_starts = np.nonzero(starts_mask)[0]
    if tok_starts.size == 0:
        e = np.empty(0, dtype=np.int64)
        if return_spans:
            return e, np.empty(0, dtype=U64), e.copy(), e.copy(), buf
        return e, np.empty(0, dtype=U64)
    pw, pw_inv = _poly_powers(n)
    with np.errstate(**_err):
        contrib = np.where(is_word, buf.astype(U64) + U64(1), U64(0)) * pw[:n]
        prefix = np.zeros(n + 1, dtype=U64)
        np.cumsum(contrib, out=prefix[1:])
    next_word = np.empty(n, dtype=bool)
    next_word[-1] = False
    next_word[:-1] = is_word[1:] & (doc_of_byte[1:] == doc_of_byte[:-1])
    tok_ends = np.nonzero(is_word & ~next_word)[0] + 1
    with np.errstate(**_err):
        th = (prefix[tok_ends] - prefix[tok_starts]) * pw_inv[tok_starts]
    if return_spans:
        return doc_of_byte[tok_starts], mix64(th), tok_starts, tok_ends, buf
    return doc_of_byte[tok_starts], mix64(th)


def token_shingles(
    texts, w: int, return_spans: bool = False
) -> tuple[np.ndarray, ...]:
    """Token w-shingle hashes (sliding windows of ``w`` tokens) per doc.

    With ``return_spans`` also returns (span_start, span_len, canon_buf):
    the shingle's CANONICAL byte key — its ``w`` tokens joined by a single
    0x00 separator inside a canonicalized buffer.  0x00 can never occur
    inside a token (the tokenizer keeps ``[A-Za-z0-9_]`` + bytes >= 0x80),
    so the join is injective: equal canonical bytes <=> equal token
    sequences, the same separator-insensitive identity the poly-hash
    computes.  This is the byte form the sha regime digests
    (``sig.rs:12-15`` digests the key's own bytes; for token shingles "the
    key" is the token sequence, not the raw span with its arbitrary
    whitespace)."""
    doc_idx, th, tok_s, tok_e, buf = token_hashes(texts, return_spans=True)
    n = th.shape[0]
    if n == 0:
        if return_spans:
            e = np.empty(0, dtype=np.int64)
            return doc_idx, th, e, e.copy(), np.empty(0, dtype=np.uint8)
        return doc_idx, th
    if return_spans:
        # canonical buffer: every token's bytes followed by one 0x00; token
        # j occupies canon[ctok_s[j] : ctok_s[j] + tl[j]] — one vectorized
        # scatter-copy, no per-token Python
        tl = tok_e - tok_s
        ctok_s = np.zeros(n, dtype=np.int64)
        np.cumsum(tl[:-1] + 1, out=ctok_s[1:])
        canon = np.zeros(int(tl.sum()) + n, dtype=np.uint8)
        total = int(tl.sum())
        if total:
            rep = np.repeat(np.arange(n), tl)
            excl = np.zeros(n, dtype=np.int64)
            np.cumsum(tl[:-1], out=excl[1:])
            within = np.arange(total) - np.repeat(excl, tl)
            canon[ctok_s[rep] + within] = buf[tok_s[rep] + within]
    pw, pw_inv = _poly_powers(n)
    with np.errstate(**_err):
        contrib = th * pw[:n]
        prefix = np.zeros(n + 1, dtype=U64)
        np.cumsum(contrib, out=prefix[1:])
    if n >= w:
        starts = np.arange(n - w + 1, dtype=np.int64)
        ok = doc_idx[starts] == doc_idx[starts + w - 1]
        starts = starts[ok]
        with np.errstate(**_err):
            win = (prefix[starts + w] - prefix[starts]) * pw_inv[starts]
        out_hash = mix64(win)
        out_doc = doc_idx[starts]
        if return_spans:
            last = starts + w - 1
            span_s = ctok_s[starts]
            span_l = ctok_s[last] + tl[last] - span_s
    else:
        out_hash = np.empty(0, dtype=U64)
        out_doc = np.empty(0, dtype=np.int64)
        span_s = np.empty(0, dtype=np.int64)
        span_l = np.empty(0, dtype=np.int64)
    if not return_spans:
        span_s = span_l = None  # type: ignore[assignment]
    # docs with fewer than w tokens: one shingle over all their tokens
    tok_counts = np.bincount(doc_idx, minlength=int(doc_idx.max()) + 1 if doc_idx.size else 0)
    short_docs = np.nonzero((tok_counts > 0) & (tok_counts < w))[0]
    if short_docs.size:
        doc_tok_start = np.searchsorted(doc_idx, short_docs, side="left")
        doc_tok_end = np.searchsorted(doc_idx, short_docs, side="right")
        with np.errstate(**_err):
            win = (prefix[doc_tok_end] - prefix[doc_tok_start]) * pw_inv[doc_tok_start]
        out_hash = np.concatenate([out_hash, mix64(win)])
        out_doc = np.concatenate([out_doc, short_docs])
        if return_spans:
            last = doc_tok_end - 1
            s = ctok_s[doc_tok_start]
            span_s = np.concatenate([span_s, s])
            span_l = np.concatenate([span_l, ctok_s[last] + tl[last] - s])
    if return_spans:
        return out_doc, out_hash, span_s, span_l, canon
    return out_doc, out_hash


def shingle_batch(
    texts, mode: str, size: int, return_spans: bool = False
) -> tuple[np.ndarray, ...]:
    """Dispatch on config: ``mode in {'char','token'}``, ``size`` = k or w."""
    if mode == "char":
        return char_shingles(texts, size, return_spans)
    if mode == "token":
        return token_shingles(texts, size, return_spans)
    raise ValueError(f"unknown shingle mode {mode!r}")


def dedupe_counts(
    doc_idx: np.ndarray, hashes: np.ndarray, return_rep: bool = False
) -> tuple[np.ndarray, ...]:
    """Multiset -> (doc_idx, unique hash, multiplicity), sorted by doc then hash.

    This is the weighted-set encoding the reference consumes
    (``IndexMap<D, F>``, ``probminhash3.rs:133-145``): object -> weight, with
    key uniqueness enforced before ``hash_item`` is called.

    With ``return_rep`` also returns, per unique (doc, hash), the index of
    one representative occurrence in the INPUT arrays — used to recover the
    raw byte span of a shingle for the sha identity regime.
    """
    if doc_idx.size == 0:
        empty = np.empty(0, dtype=np.int64)
        if return_rep:
            return doc_idx, hashes, empty, empty.copy()
        return doc_idx, hashes, empty
    order = np.lexsort((hashes, doc_idx))
    d, h = doc_idx[order], hashes[order]
    new = np.empty(d.shape[0], dtype=bool)
    new[0] = True
    new[1:] = (d[1:] != d[:-1]) | (h[1:] != h[:-1])
    starts = np.nonzero(new)[0]
    counts = np.diff(np.append(starts, d.shape[0]))
    if return_rep:
        return d[starts], h[starts], counts.astype(np.int64), order[starts]
    return d[starts], h[starts], counts.astype(np.int64)
