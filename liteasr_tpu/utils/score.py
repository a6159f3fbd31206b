"""Levenshtein edit distance (reference: liteasr/utils/score.py:4-22).

A C-accelerated version lives in liteasr_tpu.native (used when built);
this pure-Python one is the always-available fallback.
"""


def levenshtein(a, b) -> int:
    try:
        from liteasr_tpu import native

        out = native.levenshtein(a, b)
        if out is not None:
            return out
    except Exception:  # pragma: no cover - any native issue -> pure python
        pass
    return _levenshtein_py(a, b)


def _levenshtein_py(a, b) -> int:
    n, m = len(a), len(b)
    if n > m:
        a, b = b, a
        n, m = m, n
    curr = list(range(n + 1))
    for i in range(1, m + 1):
        prev, curr = curr, [i] + [0] * n
        for j in range(1, n + 1):
            insert, delete = prev[j] + 1, curr[j - 1] + 1
            change = prev[j - 1] + (a[j - 1] != b[i - 1])
            curr[j] = min(insert, delete, change)
    return curr[n]
