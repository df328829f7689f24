"""Log replay harness — the engine-side equivalent of the reference's
log_gen (log_gen/log_gen.java:60-77: append N lines every T seconds from a
source log to a tailed file). Drives the file-streaming source in demos
and tests; rate-limited, deterministic, thread-based.

Unlike the reference (which appends to ONE growing file — rewriting
visibility semantics per filesystem), each tick writes a NEW file into the
watched directory: exactly the contract Spark's file source ingests
reliably (files are immutable once visible).
"""

from __future__ import annotations

import os
import threading
import time
from collections.abc import Iterable, Iterator


class LogReplayer:
    """Replays lines into ``out_dir`` at ``lines_per_tick`` every
    ``tick_seconds`` (reference demo: 5 lines / 2 s, README.md:90)."""

    def __init__(
        self,
        lines: Iterable[str],
        out_dir: str,
        lines_per_tick: int = 5,
        tick_seconds: float = 2.0,
        file_prefix: str = "part",
    ):
        """``file_prefix`` namespaces this replayer's files: a SECOND
        replayer resuming into the same watched dir (e.g. after a sink
        crash, while the query is down) must not reuse the default
        names — its chunk index restarts at 0 and the atomic rename
        would silently OVERWRITE an already-ingested immutable file,
        breaking the file source's contract."""
        self._lines = list(lines)
        self._out_dir = out_dir
        self._n = lines_per_tick
        self._tick = tick_seconds
        self._prefix = file_prefix
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.files_written = 0

    def _chunks(self) -> Iterator[list[str]]:
        for i in range(0, len(self._lines), self._n):
            yield self._lines[i : i + self._n]

    def _run(self) -> None:
        os.makedirs(self._out_dir, exist_ok=True)
        for idx, chunk in enumerate(self._chunks()):
            if self._stop.is_set():
                return
            tmp = os.path.join(self._out_dir, f".{self._prefix}-{idx:06d}.tmp")
            final = os.path.join(self._out_dir, f"{self._prefix}-{idx:06d}.log")
            with open(tmp, "w") as f:
                f.write("\n".join(chunk) + "\n")
            os.rename(tmp, final)  # atomic visibility for the file source
            self.files_written += 1
            if self._stop.wait(self._tick):
                return

    def start(self) -> "LogReplayer":
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=10)

    def drain(self, timeout: float = 60.0) -> None:
        """Block until every chunk is written (or timeout)."""
        deadline = time.time() + timeout
        while self._thread and self._thread.is_alive() and time.time() < deadline:
            time.sleep(0.1)
