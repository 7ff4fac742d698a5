"""Client-facing frequency (cadence) estimation — exporter-side T9.

Exact port of the reference's rule chain over a label's collected history
(libnntsc/exporter.py:736-822 + sampling cutoff at 509-510):

1. sample the first 200 consecutive timestamp differences;
2. if a binsize is in effect and >90%% of diffs equal it, use the binsize;
3. else if the modal diff holds a strict majority (>=50%%), use it;
4. else the smallest diff accounting for >=20%% of samples;
5. else the mean diff rounded to the nearest integer;
6. no diffs at all -> DEFAULT_FREQUENCY (300 s).

This runs driver-side over rows already collected for export (the
distributed variant for whole-table estimation is
operators.frequency.estimate_frequency).
"""

from __future__ import annotations

from collections import Counter

DEFAULT_FREQUENCY = 300
SAMPLE_DIFFS = 200


def estimate_frequency_rows(
    timestamps: list[int], binsize: int | None = None
) -> int:
    diffs = [
        b - a
        for a, b in zip(timestamps, timestamps[1:])
        if b - a > 0
    ][:SAMPLE_DIFFS]
    if not diffs:
        return DEFAULT_FREQUENCY
    counts = Counter(diffs)
    total = len(diffs)
    if binsize and counts.get(binsize, 0) * 10 > total * 9:
        return binsize
    mode_diff, mode_n = min(
        counts.items(), key=lambda kv: (-kv[1], kv[0])
    )
    if mode_n * 2 >= total:
        return mode_diff
    small = [d for d, n in counts.items() if n * 5 >= total]
    if small:
        return min(small)
    return round(sum(diffs) / total)
