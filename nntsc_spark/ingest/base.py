"""Shared ingest expression helpers — the exact-semantics building blocks.

These encode the reference's load-bearing quirks (SURVEY.md §7.3 "Hard #1"):

- integer-truncating median over the *sorted non-null* values
  (reference: libnntsc/parsers/common.py:252-262 _find_median)
- rtt arrays = sorted non-null values + None per lost measurement appended
  AFTER the median is taken (amp_icmp.py:163-176)
- "results" counts entries whose rtt OR loss is truthy — rtt=0 does NOT
  count (amp_icmp.py:159-161 ``data.get('rtt', False) or data.get('loss',
  False)``)
- null-propagating sums: all-null -> null, matching _add_maybe_none
  (common.py:264-270); Spark's SUM does exactly this.
- IPv4/IPv6 classification by '.' in address (amp_icmp.py:109-112)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def family_expr(address: Column | str) -> Column:
    """'.' in address -> ipv4 else ipv6 (amp_icmp.py:109-112)."""
    addr = F.col(address) if isinstance(address, str) else address
    return F.when(addr.contains("."), F.lit("ipv4")).otherwise(F.lit("ipv6"))


def packet_size_str_expr(random: Column | str, size: Column | str) -> Column:
    """random -> 'random', else str(packet_size) (amp_icmp.py:114-121)."""
    rnd = F.col(random) if isinstance(random, str) else random
    sz = F.col(size) if isinstance(size, str) else size
    return F.when(rnd, F.lit("random")).otherwise(sz.cast("string"))


def int_median_expr(sorted_arr: Column) -> Column:
    """Median of a sorted bigint array with python-int truncation.

    odd n  -> a[n // 2]  (0-based)
    even n -> int((a[n//2] + a[n//2 - 1]) / 2)   (truncates; values are
    non-negative so DIV 2 matches)
    empty  -> NULL
    (reference: libnntsc/parsers/common.py:252-262)
    """
    n = F.size(sorted_arr)
    half0 = (n / 2).cast("int")  # python int(len/2)
    odd = F.element_at(sorted_arr, half0 + 1)  # element_at is 1-based
    even = (
        (F.element_at(sorted_arr, half0 + 1) + F.element_at(sorted_arr, half0))
        / 2
    ).cast("long")
    return F.when(n == 0, F.lit(None).cast("long")).otherwise(
        F.when(n % 2 == 1, odd).otherwise(even)
    )


def pad_nulls_expr(arr: Column, count: Column, dtype: str = "long") -> Column:
    """Append ``count`` NULL elements when count > 0 (the lost-measurement
    padding, amp_icmp.py:166-171; ``if streamdata['loss']:`` means 0/None
    add no padding)."""
    pad = F.array_repeat(F.lit(None).cast(dtype), count.cast("int"))
    return F.when(count > 0, F.concat(arr, pad)).otherwise(arr)


def truthy(col: Column) -> Column:
    """Python truthiness for numeric fields: not null and != 0."""
    return col.isNotNull() & (col != 0)


def results_count_expr(rtt: Column, loss: Column) -> Column:
    """Count of measurements with truthy rtt or truthy loss; all-miss -> NULL
    (amp_icmp.py:159-161 + _add_maybe_none semantics)."""
    return F.sum(F.when(truthy(rtt) | truthy(loss), 1))


def lossrate_expr(loss: Column, results: Column) -> Column:
    """loss / results when results truthy, else NULL (amp_icmp.py:172-176)."""
    return F.when(truthy(results), loss / results.cast("double"))
