"""Deterministic synthetic source-file corpus with planted duplicate clusters
(FIXTURES.md F1) plus exact brute-force ground truth.

Schema matches BASELINE.json's input_hint exactly:
``(repo string, path string, commit string, lang string, content string)``.

Ground truth is computed *exactly* at a given shingle config via an inverted
index over shingle sets (pairs sharing no shingle have J=0), so recall
measurements never depend on the generator hitting its target J levels.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from .kernels.shingles import dedupe_counts, shingle_batch

_LANGS = ["py", "rs", "java", "c", "md"]
_KEYWORDS = (
    "def fn class struct impl return if else for while match let mut pub "
    "import use include static void int float str bool true false none null "
    "self this new delete try except catch finally raise throw async await"
).split()


@dataclass
class Corpus:
    files: pd.DataFrame  # repo, path, commit, lang, content
    truth_pairs: pd.DataFrame  # id_l, id_r, j_exact (doc positions 0..n-1)
    truth_clusters: pd.DataFrame  # doc_pos, cluster_id (min member position)
    threshold: float


_PREFIXES = (
    "get set load parse merge split scan read write push pop emit bind map "
    "fold sort filter join group agg hash index cache flush sync lock free "
    "alloc init reset close open seek tell peek next prev last first"
).split()
_STEMS = (
    "row col buf page block chunk span slice frame node edge leaf root tree "
    "list dict heap queue stack ring pool slab arena token lexer parser ast "
    "plan stage task job batch shard part seg region zone bucket slot cell "
    "key val item entry record field tuple array vec str byte bit word"
).split()


def _token_pool(rng: np.random.Generator, size: int = 50_000) -> np.ndarray:
    """Lexically diverse identifier pool (prefix_stem + numeric tail) so
    unrelated files share almost no char n-grams, like real code."""
    n_combo = len(_PREFIXES) * len(_STEMS)
    idents = []
    i = 0
    while len(idents) < size:
        p = _PREFIXES[i % len(_PREFIXES)]
        s = _STEMS[(i // len(_PREFIXES)) % len(_STEMS)]
        tail = i // n_combo
        idents.append(f"{p}_{s}{tail}" if tail else f"{p}_{s}")
        i += 1
    return np.array(idents + _KEYWORDS, dtype=object)


def _render(tokens: np.ndarray) -> str:
    """tokens -> source-ish text with line breaks every ~12 tokens."""
    parts = []
    for i in range(0, len(tokens), 12):
        parts.append(" ".join(tokens[i : i + 12]))
    return "\n".join(parts)


def _mutate(
    rng: np.random.Generator, tokens: np.ndarray, edit_rate: float, pool: np.ndarray
) -> np.ndarray:
    n = len(tokens)
    out = tokens.copy()
    sub = rng.random(n) < edit_rate
    out[sub] = rng.choice(pool, size=int(sub.sum()))
    # small indel component: drop ~edit_rate/4 of positions
    keep = rng.random(n) >= edit_rate / 4
    return out[keep]


def _fresh_doc(rng: np.random.Generator, pool: np.ndarray, n_tokens: int) -> np.ndarray:
    """Realistic source file: a small per-doc local vocabulary (like local
    identifiers) mixed with global keywords, Zipf-ish usage — so unrelated
    files have near-zero shingle Jaccard, like a real code corpus."""
    vocab_size = max(12, n_tokens // 8)
    local = rng.choice(pool, size=vocab_size, replace=False)
    kw = np.array(_KEYWORDS, dtype=object)
    ranks = np.arange(1, local.size + 1, dtype=np.float64)
    p_local = 1.0 / (ranks + 2.0)
    p_local *= 0.8 / p_local.sum()  # 80% of mass on doc-local identifiers
    p_kw = np.full(kw.size, 0.2 / kw.size)
    vocab = np.concatenate([local, kw])
    p = np.concatenate([p_local, p_kw])
    return rng.choice(vocab, size=n_tokens, p=p)


def generate_files(
    n_files: int = 200,
    n_clusters: int = 8,
    seed: int = 42,
    min_tokens: int = 60,
    max_tokens: int = 400,
) -> pd.DataFrame:
    """Planted-cluster corpus; cluster member 0 is the base, member 1 an exact
    copy, further members mutated at escalating edit rates."""
    rng = np.random.default_rng(seed)
    pool = _token_pool(rng)
    # member 0 = base, member 1 = exact copy, then escalating edits
    edit_rates = [0.0, 0.0, 0.02, 0.05, 0.10, 0.20]
    rows = []
    cluster_sizes = rng.integers(2, 6, size=n_clusters)
    doc = 0
    for c in range(n_clusters):
        base = _fresh_doc(rng, pool, int(rng.integers(min_tokens, max_tokens)))
        for m in range(int(cluster_sizes[c])):
            rate = edit_rates[min(m, len(edit_rates) - 1)]
            toks = base if m == 0 else _mutate(rng, base, rate, pool)
            rows.append(
                {
                    "repo": f"org/repo-{doc % 97:05d}",
                    "path": f"src/mod_{c:04d}/file_{m}.{_LANGS[doc % len(_LANGS)]}",
                    "commit": f"{rng.integers(0, 2**63):040x}"[:40],
                    "lang": _LANGS[doc % len(_LANGS)],
                    "content": _render(toks),
                }
            )
            doc += 1
    while doc < n_files:
        toks = _fresh_doc(rng, pool, int(rng.integers(min_tokens, max_tokens)))
        rows.append(
            {
                "repo": f"org/repo-{doc % 97:05d}",
                "path": f"src/bg/file_{doc:06d}.{_LANGS[doc % len(_LANGS)]}",
                "commit": f"{rng.integers(0, 2**63):040x}"[:40],
                "lang": _LANGS[doc % len(_LANGS)],
                "content": _render(toks),
            }
        )
        doc += 1
    return pd.DataFrame(rows)


def exact_truth(
    contents: list[str],
    shingle_mode: str,
    shingle_size: int,
    threshold: float,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Exact all-pairs Jaccard >= threshold via inverted index + union-find.

    Exact because any pair with J>0 shares at least one shingle, so the
    inverted index enumerates every nonzero pair.
    """
    n = len(contents)
    doc_idx, hashes = shingle_batch(contents, shingle_mode, shingle_size)
    d, h, _ = dedupe_counts(doc_idx, hashes)  # distinct (doc, shingle)
    set_sizes = np.bincount(d, minlength=n).astype(np.int64)
    # group by shingle: docs sharing each shingle
    order = np.argsort(h, kind="stable")
    hs, ds = h[order], d[order]
    boundary = np.empty(hs.shape[0], dtype=bool)
    if hs.shape[0]:
        boundary[0] = True
        boundary[1:] = hs[1:] != hs[:-1]
    starts = np.nonzero(boundary)[0]
    ends = np.append(starts[1:], hs.shape[0])
    pair_counts: dict[tuple[int, int], int] = {}
    for s, e in zip(starts.tolist(), ends.tolist()):
        if e - s < 2:
            continue
        docs = np.sort(ds[s:e])
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                key = (int(docs[i]), int(docs[j]))
                pair_counts[key] = pair_counts.get(key, 0) + 1
    rows = []
    for (a, b), inter in pair_counts.items():
        union = set_sizes[a] + set_sizes[b] - inter
        j = inter / union if union else 1.0
        if j >= threshold:
            rows.append({"id_l": a, "id_r": b, "j_exact": j})
    truth_pairs = pd.DataFrame(rows, columns=["id_l", "id_r", "j_exact"])
    # union-find for cluster labels
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rows:
        ra, rb = find(r["id_l"]), find(r["id_r"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    labels = [find(i) for i in range(n)]
    truth_clusters = pd.DataFrame({"doc_pos": range(n), "cluster_id": labels})
    return truth_pairs, truth_clusters


def make_corpus(
    n_files: int = 200,
    n_clusters: int = 8,
    seed: int = 42,
    shingle_mode: str = "char",
    shingle_size: int = 8,
    threshold: float = 0.8,
    **gen_kwargs,
) -> Corpus:
    files = generate_files(n_files, n_clusters, seed, **gen_kwargs)
    truth_pairs, truth_clusters = exact_truth(
        files["content"].tolist(), shingle_mode, shingle_size, threshold
    )
    return Corpus(files, truth_pairs, truth_clusters, threshold)


def inject_viral_block(
    files: pd.DataFrame, fraction: float = 0.3, seed: int = 7, repeats: int = 3
) -> pd.DataFrame:
    """FIXTURES.md F5: paste one license-header block into a fraction of files
    so band keys become mega-buckets (skew stress).  ``repeats`` scales the
    block so it can dominate the shingle set."""
    rng = np.random.default_rng(seed)
    block = (
        "// Licensed under the Apache License, Version 2.0 (the License);\n"
        "// you may not use this file except in compliance with the License.\n"
        "// You may obtain a copy of the License at http://www.apache.org/licenses/\n"
    ) * repeats
    out = files.copy()
    hit = rng.random(len(out)) < fraction
    out.loc[hit, "content"] = block + out.loc[hit, "content"]
    return out
