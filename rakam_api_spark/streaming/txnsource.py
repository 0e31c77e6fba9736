"""Table-as-stream: a PySpark Python streaming data source over a
``txnlog.TxnTable`` — the Delta-streaming-source analog for this
repo's transaction log.  ``readStream.format("rakam_txntable")``
turns every committed APPEND into a micro-batch, with the commit
VERSION as the checkpointed offset:

- offsets are ``{"version": N}`` — restart resumes exactly after the
  last processed commit, replay re-reads the same version range;
- each appended file becomes one input partition (executors read
  parquet files directly; the driver touches only the log);
- content-preserving rewrites are transparent, exactly as in
  ``TxnTable.read_incremental``: a ``compact`` re-packages rows the
  stream already delivered (its files are skipped), an ``expire``
  only drops data beyond retention.  A ``merge``/``erase`` in the
  range updates rows in place, which an append-only stream cannot
  express — the source fails the stream with a clear error and the
  consumer restarts from a fresh snapshot (the same restriction
  Delta's streaming source enforces without a change data feed).

Options: ``path`` (the table dir), ``startingversion`` (default 0 =
from the first commit), ``readchangefeed`` ("true" switches to CDF
mode — Delta's ``readChangeFeed``): every DATA-CHANGING commit is
delivered with two extra columns ``_change_type`` (insert /
merge_upsert / merge_preimage / delete) and ``_commit_version``, so
``merge`` no longer fails the stream — consumers apply the change
rows instead of restarting; compaction stays invisible, and vacuumed
pre-image files skip silently (past retention, as in Delta CDF).
The stream schema is lifted from the table's live files at plan time
(plus hive partition columns as strings), so the source needs no
hand-written DDL.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition

_ARROW_TO_DDL = {
    "int8": "TINYINT",
    "int16": "SMALLINT",
    "int32": "INT",
    "int64": "BIGINT",
    "float": "FLOAT",
    "double": "DOUBLE",
    "string": "STRING",
    "large_string": "STRING",
    "bool": "BOOLEAN",
    "date32[day]": "DATE",
    "timestamp[us]": "TIMESTAMP_NTZ",
    "timestamp[ns]": "TIMESTAMP_NTZ",
}


def _table_schema(path: str) -> tuple[str, list[str], list[str]]:
    """(ddl, data_cols, partition_cols) from the newest live file's
    footer + the manifest's partition keys — driver-side, metadata
    only."""
    from ..txnlog import TxnTable

    t = TxnTable(None, path)
    state = t.state()
    if not state:
        raise ValueError(f"txn table {path} has no live files to infer a schema from")
    import pyarrow.parquet as pq

    ent = sorted(state.values(), key=lambda e: e["path"])[-1]
    schema = pq.ParquetFile(t._abs(ent["path"])).schema_arrow
    cols, ddl_parts = [], []
    for f in schema:
        ddl = _ARROW_TO_DDL.get(str(f.type))
        if ddl is None:
            raise ValueError(
                f"column {f.name}: arrow type {f.type} not supported by the "
                "txntable stream source"
            )
        cols.append(f.name)
        ddl_parts.append(f"{f.name} {ddl}")
    part_cols = sorted({k for e in state.values() for k in (e.get("partition") or {})})
    for c in part_cols:
        ddl_parts.append(f"{c} STRING")
    return ", ".join(ddl_parts), cols, part_cols


@dataclass
class _TxnFileSlice(InputPartition):
    path: str
    data_cols: tuple
    partition: tuple  # ((col, value), ...) hive values for this file
    change: tuple = ()  # CDF mode: (change_type, commit_version)


class TxnTableStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("txntable source requires option path")
        self.start_version = int(options.get("startingversion", 0))
        self.cdf = str(options.get("readchangefeed", "false")).lower() == "true"
        ddl, self._data_cols, self._part_cols = _table_schema(self.path)
        if self.cdf:
            ddl += ", _change_type STRING, _commit_version BIGINT"
        self._ddl = ddl

    def _txn(self):
        from ..txnlog import TxnTable

        return TxnTable(None, self.path)

    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        return {"version": self._txn().version()}

    def partitions(self, start: dict, end: dict):
        t = self._txn()
        out = []
        for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
            with open(t._commit_path(v)) as f:
                rec = json.load(f)
            op = rec.get("op")

            def _slices(entries, ctype):
                for e in entries or ():
                    rel = e["path"] if isinstance(e, dict) else e
                    part = tuple(
                        (c, ((e.get("partition") or {}) if isinstance(e, dict) else {}).get(c))
                        for c in self._part_cols
                    )
                    out.append(
                        _TxnFileSlice(
                            path=t._abs(rel),
                            data_cols=tuple(self._data_cols),
                            partition=part,
                            change=(ctype, v) if self.cdf else (),
                        )
                    )

            if op == "append":
                _slices(rec.get("add"), "insert")
            elif op == "merge":
                if not self.cdf:
                    raise ValueError(
                        f"txn version {v} is a 'merge': in-place row changes "
                        "cannot stream append-only — restart the consumer "
                        "from a fresh snapshot, or read with "
                        "option('readchangefeed', 'true')"
                    )
                _slices(rec.get("add"), "merge_upsert")
                _slices(rec.get("remove"), "merge_preimage")
            elif op == "expire":
                if self.cdf:
                    _slices(rec.get("remove"), "delete")
                # non-CDF: retention-only, transparent
            elif op in ("compact", "rebloom", "set_constraint", "drop_constraint"):
                continue  # content-preserving: no rows change either mode
            else:
                # fail-fast: an unrecognized op may change data — silently
                # skipping it would drop rows from the stream
                raise ValueError(
                    f"txn version {v} has unrecognized op {op!r}; refusing "
                    "to skip a potentially data-changing commit"
                )
        return out or [
            _TxnFileSlice(path="", data_cols=tuple(self._data_cols), partition=())
        ]

    def read(self, partition: _TxnFileSlice):
        if not partition.path or not os.path.exists(partition.path):
            # planned-empty batch, or the file was appended AND expired
            # (then vacuumed) before this executor read it — those rows
            # fell out of retention and are legitimately gone
            return
        import pyarrow.parquet as pq

        tbl = pq.read_table(partition.path, columns=list(partition.data_cols))
        part_vals = tuple(v for _c, v in partition.partition)
        change = tuple(partition.change)
        for batch in tbl.to_batches():
            cols = [batch.column(i).to_pylist() for i in range(batch.num_columns)]
            for row in zip(*cols):
                yield row + part_vals + change

    def commit(self, end: dict) -> None:
        pass  # checkpointed offsets are the source of truth


class TxnTableDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "rakam_txntable"

    def schema(self) -> str:
        opts = dict(self.options)
        ddl, _cols, _parts = _table_schema(opts["path"])
        if str(opts.get("readchangefeed", "false")).lower() == "true":
            ddl += ", _change_type STRING, _commit_version BIGINT"
        return ddl

    def streamReader(self, schema) -> TxnTableStreamReader:
        return TxnTableStreamReader(dict(self.options))


def register(spark) -> None:
    spark.dataSource.register(TxnTableDataSource)
