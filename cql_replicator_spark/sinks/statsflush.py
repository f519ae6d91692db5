"""Incremental accumulator→stats flushing (K:1161-1215).

The reference pairs a per-write LongAccumulator with a SparkListener
whose onTaskEnd flushes the accumulator's growth to the per-tile
replication stats object, guarded so each delta is written exactly
once: a last-reported watermark (AtomicLong) + a per-invocation lock
make concurrent listener callbacks and the authoritative post-action
flush mutually exclusive, and the final flush catches deltas whose
listener events were still in flight on the async bus (K:1197-1206).

Spark-first translation: the exactly-once delta logic is identical
(``IncrementalStatsFlusher``); the trigger differs because PySpark
exposes no driver-side SparkListener — a tiny daemon poller reads the
accumulator while the job runs (accumulator values ARE visible on the
driver mid-job as tasks complete, which is what the listener exploited)
and ``stop()`` performs the same authoritative final flush after the
action returns. On a JVM deployment the poller is replaced by the
three-line listener; everything else is shared.
"""

from __future__ import annotations

import threading
from collections.abc import Callable


class IncrementalStatsFlusher:
    """Exactly-once delta flushing from a monotone counter.

    ``read_counter`` returns the current total (e.g. ``acc.value``);
    ``write_delta(delta, total)`` persists one increment (e.g. a
    ReplicationStats carrying only the delta, into the read-add-write
    StatsStore). The already-counted guard: a flush writes
    ``current - last_reported`` and advances the watermark under the
    lock, so however many triggers race (poller tick, task-end
    callback, final flush), every row is reported exactly once.
    """

    def __init__(
        self,
        read_counter: Callable[[], int],
        write_delta: Callable[[int, int], None],
    ):
        self._read = read_counter
        self._write = write_delta
        self._lock = threading.Lock()
        self._last = 0
        self._poller: threading.Thread | None = None
        self._stop_evt = threading.Event()

    @property
    def last_reported(self) -> int:
        return self._last

    def flush(self) -> int:
        """Write the unreported delta, if any; returns it.

        Write-THEN-advance: the watermark moves only after
        ``write_delta`` returns, so a write that raises leaves its
        delta unreported and the next trigger retries it. The reverse
        order silently LOSES the delta forever on a transient write
        failure. Double-count is impossible as long as the writer is
        atomic (StatsStore.put publishes via os.replace): success and
        raise-free are the same event, and triggers serialize on the
        lock."""
        with self._lock:
            current = self._read()
            if current <= self._last:
                return 0
            delta = current - self._last
            self._write(delta, current)
            self._last = current
            return delta

    # -- trigger wiring ----------------------------------------------------
    def start_polling(self, interval_s: float = 0.25) -> None:
        """Begin incremental flushing while a job runs (the PySpark
        stand-in for onTaskEnd)."""
        if self._poller is not None:
            raise RuntimeError("poller already running")
        self._stop_evt.clear()

        def run():
            while not self._stop_evt.wait(interval_s):
                self.flush()

        self._poller = threading.Thread(target=run, daemon=True)
        self._poller.start()

    def stop(self) -> int:
        """Stop the poller and perform the authoritative final flush
        (K:1197-1206): the action has returned, the counter is final,
        any in-flight trigger's delta is captured here. Returns the
        final total reported."""
        if self._poller is not None:
            self._stop_evt.set()
            self._poller.join()
            self._poller = None
        self.flush()
        return self._last

    def __enter__(self) -> "IncrementalStatsFlusher":
        self.start_polling()
        return self

    def __exit__(self, *exc) -> None:
        self.stop()
