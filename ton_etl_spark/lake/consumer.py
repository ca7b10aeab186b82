"""Cursor-committing change-feed consumer — the downstream-datamart
pattern over `LakeTable.read_changes`.

Reference parity: the reference's dwh/datamart jobs re-consume the
exporter's Kafka topics with consumer-group offsets and land increments
into warehouse tables (re-doubt/ton-etl README.md datalake/dwh flow,
consumer offset commits in parser/main.py:85-90). Here the lake itself
is the log: the consumer keeps a durable LSN cursor, reads only rows
past it (file-skipped via manifest stats), hands them to a processing
function, and advances the cursor only after the function succeeds —
at-least-once delivery, exactly the reference's consumer contract.
Downstream exactly-once comes from pairing it with an idempotent sink
(an LSN-guarded `merge_into`), the same layering as the reference's
at-least-once Kafka consume + `ON CONFLICT` upsert (db.py:197-214).

Scale shape: a poll is one pruned scan over the files recent commits
wrote (not the table), one job for the delivered-max aggregate when
stats are absent, zero driver loops. Many independent consumers (one
cursor dir each) can tail one table without coordination — commits are
immutable snapshots.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, functions as F

from .table import LakeTable


class ChangeFeedConsumer:
    def __init__(self, table: LakeTable, cursor_dir: str, start_after: int = -1):
        self.table = table
        self.cursor_dir = cursor_dir
        self.start_after = start_after
        os.makedirs(cursor_dir, exist_ok=True)

    @property
    def _cursor_path(self) -> str:
        return os.path.join(self.cursor_dir, "_cursor")

    def cursor(self) -> int:
        if not os.path.exists(self._cursor_path):
            return self.start_after
        with open(self._cursor_path) as f:
            return int(f.read().strip())

    def _commit_cursor(self, lsn: int) -> None:
        tmp = self._cursor_path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(str(lsn))
        os.replace(tmp, self._cursor_path)

    def poll(self, fn, include_deleted: bool = True) -> dict:
        """Deliver rows with LSN > cursor to `fn(DataFrame)`, then advance
        the cursor. `fn` failure leaves the cursor untouched — the next
        poll redelivers (at-least-once). The read is pinned to one table
        version so a concurrent commit mid-poll is never half-read; its
        rows arrive in the next poll."""
        version = self.table.current_version()
        since = self.cursor()
        m = self.table.manifest(version)
        stats = [
            s[2] for s in m.get("file_stats", {}).values() if s[2] is not None
        ]
        head = max(stats) if stats else None
        if head is not None and head <= since:
            return {"delivered": False, "cursor": since, "version": version}
        feed = self.table.read_changes(
            since, version=version, include_deleted=include_deleted
        )
        if head is None:
            # no stats recorded (legacy manifest): one aggregate job
            head = feed.agg(F.max(self.table.version_field()).alias("m")).collect()[0]["m"]
            if head is None:
                return {"delivered": False, "cursor": since, "version": version}
        fn(feed)
        self._commit_cursor(head)
        return {"delivered": True, "cursor": head, "version": version}
