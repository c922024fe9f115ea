"""Suffix-array machinery (Manber–Myers construction + Kasai LCP) for
substring-level repetition analysis.

The north rule names "suffix-array substring checks" as part of pair
verification; for the PER-PAIR containment witness the engine deliberately
uses ``str.find`` on normalized text (see functions/udfs.py — building an
index to answer one membership query per pair is strictly slower). The
suffix array earns its keep on the PER-DOCUMENT question instead: the
longest substring a document repeats within itself — the character-level
generalisation of the Gopher/C4 duplicated-n-gram signals (repetition_
scores), which cap at fixed n. A 10 MB minified bundle that repeats a 400 KB
block twice is invisible to word-5-gram ratios but lights up here.

Algorithms are the published textbook versions (Manber & Myers 1990 doubling,
vectorised with numpy lexsort; Kasai et al. 2001 LCP) — O(n log n) sort
rounds, O(n) LCP — implemented from scratch.
"""

from __future__ import annotations

import numpy as np


def suffix_array(ords: np.ndarray) -> np.ndarray:
    """Suffix array of an integer sequence via Manber–Myers doubling.

    Each round sorts suffixes by their first 2^k symbols using the previous
    round's ranks as a radix pair — numpy ``lexsort`` keeps the whole round
    vectorised, so construction is a handful of array passes per doubling
    (log n rounds), not a Python-level comparison sort."""
    n = len(ords)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.unique(ords, return_inverse=True)[1].astype(np.int64)
    k = 1
    while k < n:
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        r_sorted, s_sorted = rank[order], second[order]
        bumps = (np.diff(r_sorted) != 0) | (np.diff(s_sorted) != 0)
        ranks_in_order = np.concatenate(([0], np.cumsum(bumps)))
        rank = np.empty(n, dtype=np.int64)
        rank[order] = ranks_in_order
        if ranks_in_order[-1] == n - 1:  # all ranks distinct: sorted
            break
        k *= 2
    sa = np.empty(n, dtype=np.int64)
    sa[rank] = np.arange(n)
    return sa


def lcp_kasai(ords: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai LCP: lcp[r] = longest common prefix of suffixes sa[r] and
    sa[r-1] (lcp[0] = 0). The h-decrement argument makes the scan O(n)
    amortised; the inner while compares numpy scalars, which is fine at
    per-document sizes (the operator batches docs via Arrow, so the Python
    loop cost is per-row content length, never corpus length)."""
    n = len(sa)
    lcp = np.zeros(n, dtype=np.int64)
    if n < 2:
        return lcp
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            while i + h < n and j + h < n and ords[i + h] == ords[j + h]:
                h += 1
            lcp[r] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def longest_repeat_len(text: str) -> int:
    """Length of the longest substring occurring >=2 times in ``text``
    (possibly overlapping) = max of the LCP array over the suffix array."""
    if len(text) < 2:
        return 0
    ords = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    sa = suffix_array(ords)
    lcp = lcp_kasai(ords, sa)
    return int(lcp.max()) if len(lcp) else 0
