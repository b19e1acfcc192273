"""Row-streaming insert sink (reference L3) as a Spark 4 Python
DataSink.

The reference loads via BigQuery's `insert_rows_json`, which applies
rows one micro-batch at a time and RAISES when the service reports
per-row errors (main.py:441-447). This mirrors that contract as a
custom `DataSource` writer so `df.write.format("row_insert")` drives
it natively:

- each task streams its partition's rows to the (pluggable) insert
  client and returns a commit message with its row count;
- per-row rejections surface as task failures (the reference's raise),
  so Spark's task retry / job abort semantics apply;
- `commit()` on the driver sees every task's message — the natural
  place for an ingest audit record (total rows, partitions).

The default client is filesystem-backed (one JSONL shard per task,
atomic rename on commit) — a stand-in with the same interface a real
HTTP client would implement. The DataSink API is the write-side
sibling of fb_source's DataSourceReader/SimpleDataSourceStreamReader:
together they close the loop on a fully custom Python-DataSource
pipeline (API read → transform → API write).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


class RowInsertCommit(WriterCommitMessage):
    def __init__(self, shard: str, n_rows: int):
        self.shard = shard
        self.n_rows = n_rows


class RowInsertWriter(DataSourceWriter):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("row_insert sink requires a 'path' option")
        # reference main.py:444: error rows fail the load
        self.reject_null_cols = [
            c for c in options.get("reject_null_in", "").split(",") if c
        ]

    def write(self, iterator) -> RowInsertCommit:
        os.makedirs(self.path, exist_ok=True)
        shard = os.path.join(self.path, f"_tmp_{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(shard, "w") as f:
            for row in iterator:
                d = row.asDict(recursive=True)
                bad = [c for c in self.reject_null_cols if d.get(c) is None]
                if bad:
                    raise ValueError(
                        f"insert rejected row with NULL {bad}: the service "
                        "reported per-row errors (reference main.py:444-447)"
                    )
                f.write(json.dumps(d, default=str, sort_keys=True) + "\n")
                n += 1
        return RowInsertCommit(shard, n)

    def commit(self, messages) -> None:
        total = 0
        for m in messages:
            final = m.shard.replace("_tmp_", "part_")
            os.rename(m.shard, final)  # publish atomically per shard
            total += m.n_rows
        with open(os.path.join(self.path, "_AUDIT.json"), "w") as f:
            json.dump({"rows": total, "shards": len(list(messages))}, f)

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.remove(m.shard)
            except OSError:
                pass


class RowInsertDataSource(DataSource):
    """`df.write.format("row_insert").option("path", ...)` after
    `register_sink(spark)`."""

    @classmethod
    def name(cls) -> str:
        return "row_insert"

    def writer(self, schema, overwrite: bool) -> RowInsertWriter:
        return RowInsertWriter(self.options)


def register_sink(spark) -> None:
    spark.dataSource.register(RowInsertDataSource)
