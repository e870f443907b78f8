"""Vectorized 64-bit hash primitives.

Mirrors the reference's pluggable-hasher design (``BuildHasherDefault<H>`` in
``probminhash3.rs:45``, ``superminhasher.rs:9-11``): elements are mapped to a
u64 which seeds the per-element RNG.  Supported hashers:

- ``fnv1a64``        — FNV-1a over the element's 8 little-endian bytes, the
                       hasher the reference's tests use (``fnv::FnvHasher``,
                       ``probminhash3.rs:381``; Rust's ``u64::hash`` feeds
                       native-endian bytes via ``write_u64``).
- ``nohash``         — identity for pre-hashed u64 values (``nohasher.rs:10-48``).
- ``mix64``          — SplitMix64 finalizer, our default production mix.
- ``wang64``         — Thomas Wang invertible u64 hash (+ inverse), port of
                       ``invhash.rs:39-95``; used for pre-hashed test fixtures
                       exactly like ``superminhasher.rs:418-419``.
"""

from __future__ import annotations

import numpy as np

from .rng import splitmix64_mix

U64 = np.uint64
_err = dict(over="ignore", under="ignore")

FNV_OFFSET = U64(0xCBF29CE484222325)
FNV_PRIME = U64(0x100000001B3)


def fnv1a64_u64(values: np.ndarray) -> np.ndarray:
    """FNV-1a of each u64's 8 little-endian bytes (Rust ``FnvHasher`` on u64)."""
    v = np.asarray(values, dtype=U64)
    h = np.full(v.shape, FNV_OFFSET, dtype=U64)
    with np.errstate(**_err):
        for byte_idx in range(8):
            b = (v >> U64(8 * byte_idx)) & U64(0xFF)
            h = (h ^ b) * FNV_PRIME
    return h


def fnv1a64_bytes(data: bytes) -> int:
    h = 0xCBF29CE484222325
    for b in data:
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def wang64(values: np.ndarray) -> np.ndarray:
    """Thomas Wang 64-bit invertible hash (``invhash.rs:39-67``)."""
    with np.errstate(**_err):
        k = np.asarray(values, dtype=U64)
        k = (~k) + (k << U64(21))
        k = k ^ (k >> U64(24))
        k = (k + (k << U64(3))) + (k << U64(8))  # k * 265
        k = k ^ (k >> U64(14))
        k = (k + (k << U64(2))) + (k << U64(4))  # k * 21
        k = k ^ (k >> U64(28))
        k = k + (k << U64(31))
    return k


def wang64_inverse(values: np.ndarray) -> np.ndarray:
    """Inverse of :func:`wang64` (``invhash.rs:73-95``)."""
    with np.errstate(**_err):
        k = np.asarray(values, dtype=U64)
        # invert k = k + (k << 31)
        t = k - (k << U64(31))
        k = k - (t << U64(31))
        # invert k ^= k >> 28
        t = k ^ (k >> U64(28))
        k = k ^ (t >> U64(28))
        # invert k *= 21
        k = k * U64(14933078535860113213)
        # invert k ^= k >> 14
        t = k ^ (k >> U64(14))
        t = k ^ (t >> U64(14))
        t = k ^ (t >> U64(14))
        k = k ^ (t >> U64(14))
        # invert k *= 265
        k = k * U64(15244667743933553977)
        # invert k ^= k >> 24
        t = k ^ (k >> U64(24))
        k = k ^ (t >> U64(24))
        # invert k = ~k + (k << 21)
        t = ~k
        t = ~(k - (t << U64(21)))
        t = ~(k - (t << U64(21)))
        k = ~(k - (t << U64(21)))
    return k


def mix64(values: np.ndarray) -> np.ndarray:
    """Default production u64 mixer (SplitMix64 finalizer)."""
    return splitmix64_mix(np.asarray(values, dtype=U64))


def hash_u64(values: np.ndarray, hasher: str) -> np.ndarray:
    """Apply the configured element hasher (reference: ``BuildHasherDefault``)."""
    if hasher == "nohash":
        return np.asarray(values, dtype=U64)
    if hasher == "fnv1a64":
        return fnv1a64_u64(values)
    if hasher == "mix64":
        return mix64(values)
    if hasher == "wang64":
        return wang64(values)
    if hasher == "sha":
        return sha512_256_states(values)[1]
    raise ValueError(f"unknown hasher {hasher!r}")


# sha512_256 digests of the corpus shingle vocabulary, memoized per worker
# process: shingle keys repeat massively across documents and batches, so the
# per-unique-key hashlib call amortizes toward zero on a warm worker.
_SHA_CACHE: dict[int, np.ndarray] = {}
_SHA_CACHE_MAX = 1 << 20  # ~160 MB worst case; vocabulary-sized in practice


def sha512_256_states(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """ProbMinHash3aSha identity regime (S6, ``probminhash3sha.rs:87-167``):
    each u64 key's 8 little-endian bytes are digested with SHA-512/256; the
    32-byte digest is the item's Xoshiro256++ seed state and its first word
    the identity carried in signatures (``sig.rs:12-15``).

    Returns (states (n,4) u64, ident (n,) u64).  Digests are computed once
    per UNIQUE key in the batch (np.unique) and memoized across batches —
    the only Python-level loop in the sketch path, bounded by new-vocabulary
    size, not row count.
    """
    import hashlib

    keys = np.asarray(keys, dtype=U64)
    uniq, inv = np.unique(keys, return_inverse=True)
    ustates = np.empty((uniq.size, 4), dtype=U64)
    key_bytes = uniq.astype("<u8").tobytes()
    cache = _SHA_CACHE
    cache_get = cache.get
    for i, k in enumerate(uniq.tolist()):
        c = cache_get(k)
        if c is None:
            digest = hashlib.new("sha512_256", key_bytes[i * 8 : (i + 1) * 8]).digest()
            c = np.frombuffer(digest, dtype="<u8")
            if len(cache) < _SHA_CACHE_MAX:
                cache[k] = c
        ustates[i] = c
    states = ustates[inv]
    return states, np.ascontiguousarray(states[:, 0])


def _rotl32(x: np.ndarray, k: int) -> np.ndarray:
    k = np.uint32(k)
    with np.errstate(**_err):
        return (x << k) | (x >> (np.uint32(32) - k))


def murmur3_32_u64(values: np.ndarray, seed: int = 127) -> np.ndarray:
    """MurmurHash3 x86_32 of each u64's 8 native-endian bytes — the folding
    hash the reference uses to project u64 signatures to u32/u16/u8 slots
    (``densminhash.rs:117-166``, seed 127)."""
    v = np.asarray(values, dtype=U64)
    c1, c2 = np.uint32(0xCC9E2D51), np.uint32(0x1B873593)
    h = np.full(v.shape, np.uint32(seed), dtype=np.uint32)
    with np.errstate(**_err):
        for blk in range(2):
            k = ((v >> U64(32 * blk)) & U64(0xFFFFFFFF)).astype(np.uint32)
            k = k * c1
            k = _rotl32(k, 15)
            k = k * c2
            h = h ^ k
            h = _rotl32(h, 13)
            h = h * np.uint32(5) + np.uint32(0xE6546B64)
        h = h ^ np.uint32(8)  # total length
        h = h ^ (h >> np.uint32(16))
        h = h * np.uint32(0x85EBCA6B)
        h = h ^ (h >> np.uint32(13))
        h = h * np.uint32(0xC2B2AE35)
        h = h ^ (h >> np.uint32(16))
    return h


def fold_signature(values: np.ndarray, bits: int) -> np.ndarray:
    """Project u64 signature slots to `bits`-wide ints (S25 parity:
    ``densminhash.rs:140-166`` — murmur3_32 then right-shift)."""
    assert bits in (8, 16, 32)
    h = murmur3_32_u64(values)
    return (h >> np.uint32(32 - bits)).astype(
        {8: np.uint8, 16: np.uint16, 32: np.uint32}[bits]
    )


def combine64(a: np.ndarray, b: np.ndarray | int) -> np.ndarray:
    """Order-dependent combine of two u64 streams (for band keys, w-shingles)."""
    with np.errstate(**_err):
        x = np.asarray(a, dtype=U64) * U64(0x9E3779B97F4A7C15)
        x ^= np.asarray(b, dtype=U64) + U64(0x632BE59BD9B4E019) + (x << U64(6)) + (x >> U64(2))
    return splitmix64_mix(x)
