"""SCL — cursors over query results (reference: lib/scl/, lib/session.ml).

Begin executes a DRL query against the database state *at Begin time* (the
cursor pins the db snapshot — repeatable reads, lib/session.ml:11), streams
batches via `toLocalIterator` (partition-at-a-time transfer, no full
materialization on the driver), and auto-closes on exhaustion. A session
registry caps concurrent cursors with LRU eviction (lib/session.ml:7-79).
"""

from __future__ import annotations

import hashlib
import itertools
import time
from dataclasses import dataclass, field
from typing import Iterator

from pyspark.sql import DataFrame, Row

from sakura_spark import errors

DEFAULT_BATCH = 50  # lib/scl/executor.ml:1


@dataclass
class Cursor:
    cursor_id: str
    query: str
    db_hash: str | None
    iterator: Iterator[Row]
    position: int = 0
    closed: bool = False
    schema: list[str] = field(default_factory=list)
    created_at: float = field(default_factory=time.time)  # lib/session.ml:13


class SessionRegistry:
    def __init__(self, max_cursors: int = 64):
        self.max_cursors = max_cursors
        self._cursors: dict[str, Cursor] = {}
        self._counter = itertools.count()

    def begin(
        self,
        df: DataFrame,
        query: str = "",
        db_hash: str | None = None,
        limit: int = DEFAULT_BATCH,
    ) -> tuple[str, list[Row]]:
        """Register a cursor over df and return (cursor_id, first batch).

        Cursor ids mirror the reference's hash(counter + query + db hash)
        scheme (lib/scl/executor.ml:44-58).
        """
        if len(self._cursors) >= self.max_cursors:
            oldest = next(iter(self._cursors))
            self.close(oldest)
        n = next(self._counter)
        cid = hashlib.sha256(f"{n}\x1f{query}\x1f{db_hash}".encode()).hexdigest()[:16]
        cur = Cursor(
            cursor_id=cid,
            query=query,
            db_hash=db_hash,
            iterator=df.toLocalIterator(prefetchPartitions=True),
            schema=list(df.columns),
        )
        self._cursors[cid] = cur
        return cid, self.fetch(cid, limit)

    def fetch(self, cursor_id: str, limit: int = DEFAULT_BATCH) -> list[Row]:
        cur = self._cursors.get(cursor_id)
        if cur is None or cur.closed:
            # Message verbatim from the reference registry (lib/session.ml:42-44).
            raise errors.CursorError(
                f"The cursor with identifier `{cursor_id}` was not found in "
                "the session registry."
            )
        batch = list(itertools.islice(cur.iterator, limit))
        cur.position += len(batch)
        if len(batch) < limit:
            self.close(cursor_id)  # exhaustion auto-closes (lib/session.ml:38-67)
        return batch

    def close(self, cursor_id: str) -> None:
        cur = self._cursors.pop(cursor_id, None)
        if cur is not None:
            cur.closed = True

    def gc(self, max_age_seconds: float) -> list[str]:
        """Expire cursors older than ``max_age_seconds``
        (lib/session.ml:71-79): abandoned cursors otherwise pin their
        iterator (and with it the query's snapshot) forever. Returns the
        closed cursor ids; complements the LRU cap on registration."""
        now = time.time()
        expired = [
            cid
            for cid, cur in self._cursors.items()
            if now - cur.created_at >= max_age_seconds
        ]
        for cid in expired:
            self.close(cid)
        return expired

    def open_cursors(self) -> list[str]:
        return list(self._cursors)
