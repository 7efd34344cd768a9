"""Pure text/similarity primitives shared by the Spark pipeline ops
and their pytest oracles (same share-one-implementation discipline as
functions/urlnorm.py: the pytest oracle and the Arrow-vectorized UDF
call the SAME code, so equality tests are meaningful).

All hashing is keyed with explicit seeds and stable hash functions
(blake2b) — never Python's salted ``hash()`` — so results are
identical across processes, executors, and runs.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

MERSENNE61 = (1 << 61) - 1
_TOKEN_RE = re.compile(r"\w+|[^\w\s]")


def tokens(text: str) -> list[str]:
    """BPE-ish lexer: word chunks + single punctuation marks."""
    return _TOKEN_RE.findall(text or "")


def stable_hash64(s: str, seed: int = 0) -> int:
    """64-bit keyed blake2b — process-stable (unlike ``hash()``)."""
    h = hashlib.blake2b(
        s.encode("utf-8"), digest_size=8, key=seed.to_bytes(8, "big")
    )
    return int.from_bytes(h.digest(), "big")


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Hashes of word k-shingles (sorted unique), uint64."""
    toks = (text or "").split()
    if len(toks) < k:
        shingles = [" ".join(toks)] if toks else []
    else:
        shingles = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    if not shingles:
        return np.empty(0, dtype=np.uint64)
    return np.unique(
        np.array([stable_hash64(s) for s in shingles], dtype=np.uint64)
    )


def minhash_params(n_perm: int = 64, seed: int = 7):
    """(a, b) coefficient vectors for h_i(x) = (a_i x + b_i) mod M61."""
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, MERSENNE61, size=n_perm, dtype=np.uint64)
    b = rng.integers(0, MERSENNE61, size=n_perm, dtype=np.uint64)
    return a, b


def minhash_signature(
    shingles: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """n_perm-long minhash signature (uint64); empty doc -> all M61."""
    n_perm = len(a)
    if len(shingles) == 0:
        return np.full(n_perm, MERSENNE61, dtype=np.uint64)
    # (n_sh, n_perm) via object ints to avoid uint64 mul overflow:
    # M61 fits in 61 bits, products need 122 — use Python ints per perm
    # on the (small) unique-shingle set; vectorized over shingles.
    x = shingles.astype(object)
    sig = np.empty(n_perm, dtype=np.uint64)
    for i in range(n_perm):
        vals = (int(a[i]) * x + int(b[i])) % MERSENNE61
        sig[i] = int(vals.min())
    return sig


def band_hashes(sig: np.ndarray, n_bands: int = 16) -> list[int]:
    """LSH band keys: hash of each r-row signature slice."""
    r = len(sig) // n_bands
    out = []
    for band in range(n_bands):
        chunk = sig[band * r : (band + 1) * r]
        out.append(stable_hash64(",".join(map(str, chunk)), seed=band + 1))
    return out


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted-unique hash sets."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)


def simhash64(text: str) -> int:
    """64-bit SimHash over tokens (unit weights), signed int64."""
    acc = np.zeros(64, dtype=np.int64)
    for t in tokens(text):
        h = stable_hash64(t, seed=99)
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    val = 0
    for i in range(64):
        if acc[i] > 0:
            val |= 1 << i
    if val >= 1 << 63:
        val -= 1 << 64
    return val


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def winnow_fingerprints(
    text: str, k: int = 8, window: int = 16
) -> list[int]:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003):
    rolling char k-gram hashes; per sliding window keep the min
    (rightmost on ties) — robust to local edits, dedupable by overlap."""
    s = text or ""
    if len(s) < k:
        return [stable_hash64(s, seed=3)] if s else []
    grams = np.array(
        [stable_hash64(s[i : i + k], seed=3) for i in range(len(s) - k + 1)],
        dtype=np.uint64,
    )
    if len(grams) <= window:
        return [int(grams.min())]
    out: list[int] = []
    prev = -1
    for i in range(len(grams) - window + 1):
        w = grams[i : i + window]
        j = i + int(len(w) - 1 - np.argmin(w[::-1]))  # rightmost min
        if j != prev:
            out.append(int(grams[j]))
            prev = j
    return out


STOPWORDS = {
    "en": ("the", "and", "of", "to", "a", "in", "is"),
    "es": ("el", "la", "de", "que", "los", "una"),
    "de": ("der", "die", "und", "das", "ein", "nicht"),
    "fr": ("le", "la", "les", "et", "une", "dans"),
    "zh": ("de", "shi", "bu", "le", "zai", "you"),
}
LANG_ORDER = ("en", "es", "de", "fr", "zh")  # deterministic tie-break
