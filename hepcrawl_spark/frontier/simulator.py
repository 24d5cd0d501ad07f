"""Pure-Python Scrapy-semantics crawl-schedule simulator — the parity
oracle for the distributed scheduler (FIXTURES.md §5).

Independent implementation (event-driven, one request at a time) of the
reference scheduler's public semantics: priority queues with LIFO
tie-break, per-host download delay and per-host concurrency, zero fetch
duration (the deterministic serial contract, BASELINE.md).  The Spark
operator in politeness.py must emit the identical (fetch order, url,
fetch_ts) sequence.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field
from typing import Dict, List, Tuple


@dataclass
class HostBudget:
    delay: float = 0.0
    concurrency: int = 16


@dataclass
class _HostState:
    next_allowed: float = 0.0
    fetched_in_window: int = 0
    window_ts: float = field(default=-1.0)


def simulate_schedule(
    requests: List[Tuple[str, str, int, int]],
    budgets: Dict[str, HostBudget],
    round_start: float = 0.0,
    host_offsets: Dict[str, float] | None = None,
) -> List[Tuple[int, str, float]]:
    """requests: (url, host, priority, seq) in enqueue order.

    Returns [(fetch_order, url, fetch_ts)] in fetch order.
    """
    host_offsets = host_offsets or {}
    states: Dict[str, _HostState] = {}
    for host in {h for _, h, _, _ in requests}:
        base = max(host_offsets.get(host, 0.0), round_start)
        states[host] = _HostState(next_allowed=base, window_ts=-1.0)

    # min-heap keyed by (ready_ts, -priority, -seq)
    heap: List[Tuple[float, int, int, str, str]] = []
    for url, host, priority, seq in requests:
        heapq.heappush(
            heap, (states[host].next_allowed, -priority, -seq, url, host)
        )

    out: List[Tuple[int, str, float]] = []
    order = 0
    while heap:
        ready_ts, negp, negs, url, host = heapq.heappop(heap)
        st = states[host]
        if ready_ts < st.next_allowed:
            # host advanced since this entry was pushed — requeue
            heapq.heappush(heap, (st.next_allowed, negp, negs, url, host))
            continue
        fetch_ts = st.next_allowed
        order += 1
        out.append((order, url, fetch_ts))

        budget = budgets.get(host, HostBudget())
        if st.window_ts != fetch_ts:
            st.window_ts = fetch_ts
            st.fetched_in_window = 0
        st.fetched_in_window += 1
        if st.fetched_in_window >= max(budget.concurrency, 1):
            st.next_allowed = fetch_ts + budget.delay
            st.window_ts = -1.0
    return out
