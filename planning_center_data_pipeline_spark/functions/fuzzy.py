"""Exact-rational Jaro-Winkler similarity, quantized to micro-units
(SURVEY.md §2.10 text analysis: fuzzy string matching for entity
resolution / near-dup candidate scoring).

Why rational arithmetic: the Jaro score is the rational
``(m/l1 + m/l2 + (m-t)/m) / 3`` and the Winkler boost another rational
transform — computing it in floats makes argmax/threshold results
depend on each engine's rounding at ulp scale (ties between candidates
with different (m, l1, l2, t) are common in blocked matching).  Here
the score is carried as an exact integer pair (num, den) and only
quantized once, to ``round(jw * 1e6)`` with exact half-away-from-zero
integer rounding — so Spark output is deterministically hash-equal to
a DuckDB oracle using ``ROUND(jaro_winkler_similarity(a,b)*1e6)``
(parity verified over every blocked pair of the test corpus at sf0.01
and sf0.1, plus the classic literature pairs; DuckDB applies the
Winkler boost when jaro >= 0.7, prefix capped at 4, p = 0.1,
transpositions = floor(mismatched-match-positions / 2), all mirrored
exactly).

Scale shape: the kernel is per-pair Python — the blocking join that
feeds it (equi-join on block keys) bounds the pair count, exactly like
the MinHash band join.  `jw_micro_pairs` ENFORCES this contract: every
scored pair must carry its block key (so a cross product can't reach
the kernel unlabeled), and any single block exceeding
``MAX_PAIRS_PER_BLOCK`` within a batch — the signature of a degenerate
or missing blocking key — raises instead of silently burning CPU.
Callers that genuinely want an unblocked batch (tests, tiny literature
corpora) must say so with ``unsafe_allow_unblocked=True``.
"""

from __future__ import annotations

from collections import Counter

# Ceiling on candidate pairs a single block may contribute within one
# Arrow batch.  A real blocking key (noun+brand, band bucket, soundex)
# keeps blocks tiny; a constant / near-constant key — a disguised cross
# product — blows through this within the first batch.
MAX_PAIRS_PER_BLOCK = 10_000


def jaro_winkler_micro(s1: str, s2: str) -> int:
    """round(jaro_winkler(s1, s2) * 1_000_000) as an exact integer."""
    l1, l2 = len(s1), len(s2)
    if not l1 or not l2:
        return 0  # DuckDB scores even ('','') as 0, not 1
    if s1 == s2:
        return 1_000_000
    window = max(max(l1, l2) // 2 - 1, 0)
    f1 = [False] * l1
    f2 = [False] * l2
    m = 0
    for i in range(l1):
        lo, hi = max(0, i - window), min(l2, i + window + 1)
        for j in range(lo, hi):
            if not f2[j] and s1[i] == s2[j]:
                f1[i] = f2[j] = True
                m += 1
                break
    if m == 0:
        return 0
    a = [s1[i] for i in range(l1) if f1[i]]
    b = [s2[j] for j in range(l2) if f2[j]]
    t = sum(x != y for x, y in zip(a, b)) // 2
    # jaro = num/den exactly
    num = m * m * l2 + m * m * l1 + (m - t) * l1 * l2
    den = 3 * l1 * l2 * m
    pfx = 0
    for x, y in zip(s1[:4], s2[:4]):
        if x != y:
            break
        pfx += 1
    if pfx and 10 * num >= 7 * den:  # boost iff jaro >= 0.7 (DuckDB parity)
        # jw = jaro + pfx*0.1*(1-jaro) = (10*num + pfx*(den-num)) / (10*den)
        num, den = 10 * num + pfx * (den - num), 10 * den
    # round half away from zero (positive operands)
    return (num * 2_000_000 + den) // (2 * den)


def jw_micro_pairs(left, right, block=None, *, unsafe_allow_unblocked=False):
    """Vectorized-over-a-batch form for mapInPandas/pandas UDFs:
    two same-length sequences of strings -> list[int] of micro-JW.

    ``block`` must be a same-length sequence of blocking keys (the join
    key that bounded the candidate pairs).  Calling without it raises —
    the per-pair Python kernel must never see an unblocked cross
    product; pass ``unsafe_allow_unblocked=True`` only for bounded test
    corpora.  Any single block contributing more than
    ``MAX_PAIRS_PER_BLOCK`` pairs within this batch raises ValueError
    (degenerate blocking key)."""
    if block is None:
        if not unsafe_allow_unblocked:
            raise ValueError(
                "jw_micro_pairs called without a block key sequence: the "
                "Jaro-Winkler kernel is per-pair Python and must only run "
                "over blocking-join-bounded candidates. Pass block=<keys> "
                "(one per pair), or unsafe_allow_unblocked=True for a "
                "bounded test corpus."
            )
    else:
        counts = Counter(block)
        worst, n = max(counts.items(), key=lambda kv: kv[1])
        if n > MAX_PAIRS_PER_BLOCK:
            raise ValueError(
                f"degenerate blocking key: block {worst!r} contributes "
                f"{n} candidate pairs in one batch "
                f"(> MAX_PAIRS_PER_BLOCK={MAX_PAIRS_PER_BLOCK}); this is "
                "a disguised cross product - refine the blocking key."
            )
    return [jaro_winkler_micro(a, b) for a, b in zip(left, right)]
