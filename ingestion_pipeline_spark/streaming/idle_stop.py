"""Idle-timeout stream termination (SURVEY §2.11 W4, §4 item 2).

The reference's DAG consumer exits its poll loop after 10 s without
messages (``airflow/dags/src/consumer.py:129-158``). Structured
Streaming has no built-in idle stop for unbounded triggers, so we track
progress events from a ``StreamingQueryListener``: a query that reports
zero input rows for longer than the timeout is stopped.

For scheduled drains, prefer ``trigger(availableNow=True)`` (native
drain-and-stop, S6); this listener is for long-running queries that
should release resources when the topic goes quiet.
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class IdleStopListener(StreamingQueryListener):
    """Records the last time each query made progress with >0 input rows."""

    def __init__(self) -> None:
        self.last_activity: dict[str, float] = {}

    def onQueryStarted(self, event) -> None:
        self.last_activity[str(event.id)] = time.time()

    def onQueryProgress(self, event) -> None:
        if event.progress.numInputRows > 0:
            self.last_activity[str(event.progress.id)] = time.time()

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        self.last_activity.pop(str(event.id), None)


def run_until_idle(
    spark: SparkSession,
    query,
    inactivity_timeout: float = 10.0,
    poll_interval: float = 0.5,
    max_wait: float | None = None,
) -> None:
    """Block until ``query`` has processed nothing for
    ``inactivity_timeout`` seconds (reference default 10 s —
    airflow/dags/src/consumer.py:129), then stop it."""
    listener = IdleStopListener()
    spark.streams.addListener(listener)
    started = time.time()
    try:
        listener.last_activity[str(query.id)] = time.time()
        while query.isActive:
            idle_for = time.time() - listener.last_activity.get(str(query.id), started)
            if idle_for >= inactivity_timeout:
                query.stop()
                break
            if max_wait is not None and time.time() - started > max_wait:
                query.stop()
                break
            time.sleep(poll_interval)
        query.awaitTermination(30)
    finally:
        spark.streams.removeListener(listener)
