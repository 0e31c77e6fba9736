"""Shared sketch kernels used by both batch and streaming operators.

One implementation of the Misra-Gries counter update serves the
batch ``analytics.events.heavy_hitters_sketch`` partition sketch,
the streaming ``streaming.windows.StreamingHeavyHitters`` group
state, and the test harness — the operators are documented as twins
and must never drift apart.
"""

from __future__ import annotations

MG_K = 16  # default Misra-Gries counter budget per partition/shard


def mg_update(counters: dict[str, int], item_series, k: int = MG_K) -> dict[str, int]:
    """Merge one Arrow batch of items into a Misra-Gries counter set
    bounded at ``k`` entries.

    The batch's exact counts (vectorized ``value_counts``) merge
    into ``counters``; if the set then exceeds ``k``, one
    GENERALIZED DECREMENT subtracts the (k+1)-th largest weight from
    every counter and drops the non-positive ones — equivalent to
    that many rounds of classic MG's decrement-all step, preserving
    the guarantee that total undercount per item ≤ N/(k+1).
    """
    for item, c in item_series.value_counts().items():
        counters[item] = counters.get(item, 0) + int(c)
    if len(counters) > k:
        delta = sorted(counters.values(), reverse=True)[k]
        counters = {i: n - delta for i, n in counters.items() if n > delta}
    return counters
