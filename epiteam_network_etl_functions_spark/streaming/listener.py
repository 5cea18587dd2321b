"""Streaming progress audit via ``StreamingQueryListener``.

At 100 TB a streaming pipeline is operated off its progress metrics —
rows/sec per source, batch durations, state-store growth — not off the
sink contents. The reference has no streaming surface at all (its
closest analogue is the wall-clock benchmark table written per stage,
``src/utils/stopwatch.py``); this module is the Spark-native
observability counterpart: a listener that accumulates every
``StreamingQueryProgress`` for selected queries and reduces them to an
audit row a health check can assert on.

Design notes for cluster scale:
- The listener runs on the DRIVER listener bus and receives one event
  per micro-batch — O(batches), never O(rows), so accumulation is
  bounded regardless of data volume.
- Events are delivered asynchronously; ``wait_terminated`` polls for
  the terminated event so tests (and health checks) can read a settled
  snapshot instead of racing the bus.
- ``summary()`` cross-foots the per-batch ``numInputRows`` against the
  sink's ``numOutputRows`` — the invariant the pytest differential
  locks against the memory-sink table count.
"""

from __future__ import annotations

import json
import threading
import time
from typing import Any

from pyspark.sql.streaming import StreamingQueryListener


class ProgressAuditListener(StreamingQueryListener):
    """Accumulates progress events for queries by name.

    Thread-safe: the listener bus delivers events on its own thread
    while tests/health checks read from the main thread.
    """

    def __init__(self, query_names: set[str] | None = None):
        self._names = set(query_names) if query_names else None
        self._lock = threading.Lock()
        self.progresses: list[dict[str, Any]] = []
        self.started: list[str] = []
        self.terminated: list[str] = []
        # query id -> name, recorded at start so termination events
        # (which carry only the id) can be filtered to watched names
        self._id_to_name: dict[str, str] = {}

    # -- listener callbacks (bus thread) --------------------------------
    def onQueryStarted(self, event) -> None:
        with self._lock:
            self.started.append(event.name)
            self._id_to_name[str(event.id)] = event.name

    def onQueryProgress(self, event) -> None:
        # event.progress is a StreamingQueryProgress; its json form is
        # the stable cross-version surface
        p = json.loads(event.progress.json)
        if self._names is None or p.get("name") in self._names:
            with self._lock:
                self.progresses.append(p)

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing
        pass

    def onQueryTerminated(self, event) -> None:
        with self._lock:
            # count only watched queries — a concurrent unrelated
            # query's termination must not satisfy wait_terminated
            # (that is the race this listener exists to prevent)
            name = self._id_to_name.get(str(event.id))
            if self._names is None or name in self._names:
                self.terminated.append(str(event.id))

    # -- driver-side reads ----------------------------------------------
    def wait_terminated(self, n: int = 1, timeout_s: float = 60.0) -> bool:
        """Poll until ``n`` terminated events from WATCHED queries
        arrived (the bus is async; awaitTermination on the query
        returns before the final events are necessarily delivered)."""
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            with self._lock:
                if len(self.terminated) >= n:
                    return True
            time.sleep(0.05)
        return False

    def summary(self, name: str) -> dict[str, Any]:
        """Audit row for one query: batch count, input/output row
        totals, max batch duration, max per-batch input — the numbers
        a throughput/backlog/backpressure alert thresholds on.

        ``max_batch_input_rows`` is the backpressure lever's proof: a
        source admission bound (maxFilesPerTrigger /
        maxOffsetsPerTrigger) is only working if the LARGEST batch the
        listener saw stays under the per-trigger capacity the cluster
        was sized for — totals can look healthy while one giant batch
        blows the state store or executor memory.
        """
        with self._lock:
            ps = [p for p in self.progresses if p.get("name") == name]
        per_batch_input = [
            sum(int(s.get("numInputRows", 0)) for s in p.get("sources", []))
            for p in ps
        ]
        n_input = sum(per_batch_input)
        n_output = sum(
            int((p.get("sink") or {}).get("numOutputRows", 0)) for p in ps
        )
        durations = [
            int((p.get("durationMs") or {}).get("triggerExecution", 0))
            for p in ps
        ]
        state_rows = [
            int(s.get("numRowsTotal", 0))
            for p in ps
            for s in p.get("stateOperators", [])
        ]
        return {
            "name": name,
            "n_batches": len(ps),
            "num_input_rows": n_input,
            "num_output_rows": n_output,
            "max_batch_input_rows": (
                max(per_batch_input) if per_batch_input else 0
            ),
            "max_trigger_ms": max(durations) if durations else 0,
            "max_state_rows": max(state_rows) if state_rows else 0,
        }
