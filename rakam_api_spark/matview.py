"""Materialized views — the engine-side implementation of the
reference's declared materialized-view surface.

The reference registers ``materialized-view`` as a first-class API
tag (rakam/.../ServiceStarter.java:201) but this snapshot ships no
service implementation (the EventStream pattern, SURVEY.md §2.8);
its warehouse-backed editions materialize a saved query into a table
and refresh it by running the query over ONLY the data that arrived
since the last update, appending the result — correct whenever the
view query is slice-decomposable over arrival order (per-event
transformations, time-window aggregates keyed by the slice), which
is the documented contract the caller opts into.

Here that contract is implemented exactly, on the transaction log:

- ``create(project, name, sql)`` gates the statement through the
  query service's read-only validation, pins every base collection's
  commit version, materializes the result into a txn-logged view
  table, and records the base versions.
- ``refresh(project, name)`` is a metadata-only no-op when no base
  advanced.  When the (single) base advanced by INSERT-ONLY commits,
  the increment is served by the change feed (``TxnTable.changes``,
  the same primitive behind ``table_changes(...)``), the view SQL
  runs over just that increment, and the result APPENDS — with the
  append made idempotent through the commit log's (app, app_version)
  transaction identifiers, so a crash between the data commit and
  the metadata write can never double-apply an increment.
- Any rewrite in a base (merge/expire), a multi-collection view, or
  ``full=True`` falls back to a FULL recompute published as ONE
  atomic ``TxnTable.replace`` commit (readers flip at a single
  version; the change feed renders the swap as pre/post images).
- Views are queryable from SQL as ``materialized_<name>`` (the
  query service registers them beside the collection views).

Scale: refresh cost is O(increment) for the incremental path — the
change feed reads only the files the new commits added, never a
snapshot diff; the full path is one distributed recompute + one
atomic swap.  Staleness checks are commit-log metadata reads (no
data I/O).
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession

_NAME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9_]*$")

#: ops that change a table's logical content; anything else
#: (compact/rebloom/constraint metadata) is invisible to a view
_DATA_OPS = {"append", "merge", "expire"}


class MaterializedViewService:
    """Create / refresh / drop materialized views over a project's
    transaction-logged collections (see module docstring for the
    refresh contract)."""

    def __init__(self, spark: SparkSession, store):
        self.spark = spark
        self.store = store

    # --- layout ----------------------------------------------------------

    def _dir(self, project: str) -> str:
        return os.path.join(self.store.warehouse, project, "_matviews")

    def _meta_path(self, project: str, name: str) -> str:
        return os.path.join(self._dir(project), f"{name}.json")

    def _table(self, project: str, name: str):
        from .txnlog import TxnTable

        return TxnTable(
            self.spark, os.path.join(self._dir(project), f"{name}.txn")
        )

    def _meta(self, project: str, name: str) -> dict:
        try:
            with open(self._meta_path(project, name)) as f:
                return json.load(f)
        except FileNotFoundError:
            raise ValueError(f"no materialized view {project}.{name}")

    def _write_meta(self, project: str, name: str, meta: dict) -> None:
        os.makedirs(self._dir(project), exist_ok=True)
        tmp = self._meta_path(project, name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path(project, name))

    def list(self, project: str) -> list[str]:
        try:
            return sorted(
                f[:-5]
                for f in os.listdir(self._dir(project))
                if f.endswith(".json") and not f.endswith(".tmp")
            )
        except FileNotFoundError:
            return []

    # --- SQL plumbing ----------------------------------------------------

    def _service(self):
        from .query_service import QueryService

        return QueryService(self.spark, self.store)

    def _relations(self, sql: str) -> list[str]:
        """Collection names the statement references (parse-only)."""
        from .query_service import QueryService

        parsed = (
            self.spark._jsparkSession.sessionState().sqlParser().parsePlan(sql)
        )
        rels = set()
        for m in QueryService._REL_RE.finditer(parsed.treeString()):
            rels.add(m.group(1).split(", ")[0].strip("`"))
        return sorted(rels)

    def _run_over(self, sql: str, frames: dict[str, DataFrame]) -> DataFrame:
        """Analyze ``sql`` with each collection name bound to the
        given frame (pinned snapshot or increment); views drop after
        the eager analysis, so execution is registration-free."""
        try:
            for coll, df in frames.items():
                df.createOrReplaceTempView(coll)
            return self.spark.sql(sql)
        finally:
            for coll in frames:
                self.spark.catalog.dropTempView(coll)

    # --- surface ---------------------------------------------------------

    def create(self, project: str, name: str, sql: str) -> dict:
        """Validate, materialize at a pinned snapshot, record base
        versions.  Every referenced collection must be transaction-
        logged (staleness and increments are commit-log facts)."""
        if not _NAME_RE.match(name):
            raise ValueError(f"invalid view name: {name!r}")
        if os.path.exists(self._meta_path(project, name)):
            raise ValueError(f"materialized view {project}.{name} exists")
        svc = self._service()
        err = svc._gate(sql)
        if err is not None:
            raise ValueError(err.message)
        from .query_service import _TABLE_CHANGES_RE

        if _TABLE_CHANGES_RE.search(sql):
            raise ValueError(
                "materialized views over table_changes() are not supported: "
                "reference the collection directly — refresh() already "
                "consumes the change feed for you"
            )
        bases = self._relations(sql)
        if not bases:
            raise ValueError("view statement references no collection")
        known = set(self.store.metastore.collections(project))
        for coll in bases:
            if coll not in known:
                raise ValueError(f"unknown collection: {coll}")
            if not self.store.txn_mode(project, coll):
                raise ValueError(
                    f"{coll} is not transaction-logged; enable_txn first — "
                    "view staleness/increments are commit-log facts"
                )
        pinned = {
            coll: self.store.txn_table(project, coll).version()
            for coll in bases
        }
        frames = {
            coll: self.store.txn_table(project, coll).read(version=v)
            for coll, v in pinned.items()
        }
        out = self._run_over(sql, frames)
        view = self._table(project, name)
        view.append(out)
        meta = {
            "name": name,
            "sql": sql,
            "bases": pinned,
            # incremental append is only sound for a single base: a
            # multi-collection view's increment is not expressible as
            # one slice (rakam's per-collection model has the same
            # boundary)
            "incremental_capable": len(bases) == 1,
        }
        self._write_meta(project, name, meta)
        return dict(meta, rows=None, mode="initial")

    def staleness(self, project: str, name: str) -> dict:
        """Per-base versions behind HEAD — commit-log metadata only."""
        meta = self._meta(project, name)
        return {
            coll: self.store.txn_table(project, coll).version() - v
            for coll, v in meta["bases"].items()
        }

    def table(self, project: str, name: str) -> DataFrame:
        self._meta(project, name)  # existence gate
        return self._table(project, name).read()

    def drop(self, project: str, name: str) -> None:
        import shutil

        self._meta(project, name)
        os.remove(self._meta_path(project, name))
        shutil.rmtree(
            os.path.join(self._dir(project), f"{name}.txn"),
            ignore_errors=True,
        )

    def _insert_only(self, project: str, coll: str, frm: int, to: int) -> bool:
        """True when every data-changing commit in (frm, to] is an
        append — a metadata scan of the commit records, no data I/O."""
        t = self.store.txn_table(project, coll)
        for rec in t.history(since=frm + 1):
            if rec["version"] > to:
                break
            op = rec.get("op")
            if op in _DATA_OPS and op != "append":
                return False
        return True

    def refresh(self, project: str, name: str, full: bool = False) -> dict:
        """Bring the view up to date.  Returns {mode, versions} where
        mode is ``noop`` | ``incremental`` | ``full``."""
        meta = self._meta(project, name)
        current = {
            coll: self.store.txn_table(project, coll).version()
            for coll in meta["bases"]
        }
        if current == meta["bases"] and not full:
            return {"mode": "noop", "versions": current}
        incremental = (
            not full
            and meta["incremental_capable"]
            and all(
                self._insert_only(project, coll, meta["bases"][coll], cur)
                for coll, cur in current.items()
            )
        )
        view = self._table(project, name)
        if incremental:
            ((coll, last),) = meta["bases"].items()
            cur = current[coll]
            feed = self.store.changes(project, coll, last, cur)
            increment = feed.drop("_change_type", "_commit_version")
            out = self._run_over(meta["sql"], {coll: increment})
            # idempotent through the commit log: a crash after this
            # append but before the meta write replays harmlessly
            view.append(out, app=f"matview:{name}", app_version=cur)
            mode = "incremental"
        else:
            frames = {
                coll: self.store.txn_table(project, coll).read(version=v)
                for coll, v in current.items()
            }
            out = self._run_over(meta["sql"], frames)
            view.replace(out)
            mode = "full"
        meta["bases"] = current
        self._write_meta(project, name, meta)
        return {"mode": mode, "versions": current}
