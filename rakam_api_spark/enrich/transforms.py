"""P6/S9: custom per-project transforms — the Spark re-expression of
the reference's sandboxed JavaScript extension points.

Reference surface:
- custom event mapper: per-project stored JS ``mapper(events, …)``
  that reads/mutates event properties, can add new fields (which
  triggers schema evolution) and set cookies
  (rakam/.../plugin/CustomEventMapperHttpService.java:269-361);
- webhook source: stored JS ``module(queryParams, body, params,
  headers) → {collection, properties}``
  (rakam/.../collection/WebHookHttpService.java:154-268).

Here transforms are named Python callables in a registry (the
engine's "stored procedures").  Event-mapper transforms run inside
the ingest pipeline as DataFrame→DataFrame stages — row-local, so
any Python work rides mapInPandas/Arrow, and new columns flow into
the post-enrichment inference pass for schema evolution.  Webhook
transforms run at the gateway on the raw request.

Sandboxing contract (the reference locks Nashorn down and applies a
3 s request timeout — JSCodeCompiler.java:113-149,
WebHookHttpService.java:196):

- Python callables here are TRUSTED code registered by the operator
  — the engine does not execute user-uploaded source strings, so
  capability confinement is out of scope by design.
- Request LATENCY is bounded: ``invoke_webhook`` enforces the
  reference's 3 s wall-clock timeout (configurable) and raises
  :class:`TransformTimeout` — a slow transform cannot stall the
  gateway request path.  A timed-out worker thread is abandoned, not
  killed (CPython cannot force-kill threads), so the bound is on
  request latency, not on CPU — the honest analog of the reference's
  interruptible JS engine.
- Event-mapper transforms are PLAN BUILDERS (DataFrame → DataFrame):
  they run at plan-construction time on the driver and their row
  work executes inside Spark's own task limits; a mapper that
  collects or blocks violates its contract and is the operator's
  responsibility, exactly like a pathological registered UDF.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

EventTransform = Callable[[DataFrame, dict], DataFrame]
WebhookTransform = Callable[[dict, str, dict, dict], dict | None]

DEFAULT_WEBHOOK_TIMEOUT_SEC = 3.0  # reference WebHookHttpService.java:196


class TransformTimeout(Exception):
    """A webhook transform exceeded its wall-clock budget."""


@dataclass
class TransformRegistry:
    event_mappers: dict[tuple[str, str], EventTransform] = field(default_factory=dict)
    webhooks: dict[tuple[str, str], WebhookTransform] = field(default_factory=dict)

    # --- custom event mappers (P6) --------------------------------------

    def register_event_mapper(self, project: str, name: str, fn: EventTransform) -> None:
        self.event_mappers[(project, name)] = fn

    def event_mappers_for(self, project: str) -> list[EventTransform]:
        return [fn for (p, _), fn in sorted(self.event_mappers.items()) if p == project]

    # --- webhook source transforms (S9) ---------------------------------

    def register_webhook(self, project: str, hook_id: str, fn: WebhookTransform) -> None:
        self.webhooks[(project, hook_id)] = fn

    def invoke_webhook(
        self,
        project: str,
        hook_id: str,
        query_params: dict | None = None,
        body: str = "",
        params: dict | None = None,
        headers: dict | None = None,
        timeout_sec: float | None = DEFAULT_WEBHOOK_TIMEOUT_SEC,
    ) -> dict | None:
        """Run a webhook transform on a raw request; returns the
        event dict ``{"collection": …, "properties": {…}}`` or None
        to drop (reference returns null → no event).  Bounded by the
        reference's 3 s wall-clock timeout (``timeout_sec=None``
        disables the bound for trusted in-process callers)."""
        fn = self.webhooks.get((project, hook_id))
        if fn is None:
            raise KeyError(f"webhook does not exist: {project}/{hook_id}")
        args = (query_params or {}, body, params or {}, headers or {})
        if timeout_sec is None:
            return fn(*args)
        import threading

        # daemon thread, not a pool: a timed-out worker is abandoned
        # without blocking this request, later requests, or process
        # exit (ThreadPoolExecutor.shutdown would join it)
        outcome: dict = {}

        def run() -> None:
            try:
                outcome["value"] = fn(*args)
            except BaseException as e:  # transform errors propagate to the caller
                outcome["error"] = e

        t = threading.Thread(target=run, daemon=True, name=f"webhook-{project}-{hook_id}")
        t.start()
        t.join(timeout_sec)
        if t.is_alive():
            raise TransformTimeout(f"webhook {project}/{hook_id} exceeded {timeout_sec}s")
        if "error" in outcome:
            raise outcome["error"]
        return outcome.get("value")


class CustomMapperStage:
    """Adapter running a project's registered event-mapper transforms
    as one pipeline stage (ordered by name, as the reference runs
    its mapper list in registration order)."""

    name = "custom"

    def __init__(self, registry: TransformRegistry, project: str):
        self.registry = registry
        self.project = project

    def dependency(self):
        from .pipeline import FieldDependency

        return FieldDependency()

    def triggers(self) -> set[str]:
        return set()

    def apply(self, df: DataFrame, ctx: dict) -> DataFrame:
        for fn in self.registry.event_mappers_for(self.project):
            df = fn(df, ctx)
        return df
