"""P11: declared stream subscriptions.

Reference: ``CollectionStreamQuery(collection, filter)`` +
``EventStream.subscribe(project, collections, columns, response)``
(rakam-spi/.../plugin/stream/CollectionStreamQuery.java:20-39,
EventStream.java:7-18).  The SPI is *declared but unimplemented* in
the reference snapshot — no class implements EventStream — so this
is a from-scratch native implementation: each subscription is a
filter + projection applied to every stored micro-batch, pushing
matching rows to a callback (the reference's ``response`` writer).
"""

from __future__ import annotations

import threading
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class StreamSubscription:
    project: str
    collection: str
    filter: str | None = None  # SQL expression over event columns
    columns: list[str] | None = None  # projection; None = all
    callback: Callable[[list[dict]], None] = lambda rows: None


@dataclass
class SubscriptionRegistry:
    subs: list[StreamSubscription] = field(default_factory=list)
    # collection ingests within an epoch may run on a thread pool;
    # callbacks are user code, so deliveries are serialized
    _cb_lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    def subscribe(self, sub: StreamSubscription) -> StreamSubscription:
        self.subs.append(sub)
        return sub

    def unsubscribe(self, sub: StreamSubscription) -> None:
        self.subs.remove(sub)

    def push(
        self, project: str, collection: str, batch: DataFrame, row_cap: int = 10_000
    ) -> None:
        """Deliver ONE coerced micro-batch to matching subscriptions
        — callers pass the batch frame, never a stored-table re-read,
        so a subscriber sees each event exactly once per committed
        epoch.  Filter/projection run as DataFrame ops (Catalyst
        prunes the per-subscription plan); at most ``row_cap``
        matching rows are collected per push so a pathological batch
        cannot melt the driver."""
        for sub in self.subs:
            if sub.project != project or sub.collection != collection:
                continue
            df = batch
            if sub.filter:
                df = df.where(F.expr(sub.filter))
            if sub.columns:
                df = df.select(*[F.col(f"`{c}`") for c in sub.columns])
            rows = [r.asDict() for r in df.limit(row_cap).collect()]
            if rows:
                with self._cb_lock:
                    sub.callback(rows)
