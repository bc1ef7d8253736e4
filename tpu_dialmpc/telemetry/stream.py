"""Async host-side telemetry stream.

Replaces the reference's synchronous stdout dumps + post-hoc gnuplot fork
(dial_mpc_eigen_plotting/src/dial-core-simulate.cpp:138-174, 219-329) with a
non-blocking queue: the control loop hands off small device arrays, a writer
thread serializes JSONL.  When the native sink is built (tpu_dialmpc/native),
records are also pushed into its lock-free ring buffer; the pure-Python writer
is always available as fallback.
"""

from __future__ import annotations

import json
import queue
import threading
import time
from typing import Optional

import numpy as np


class TelemetryStream:
    """JSONL telemetry writer with a background thread."""

    def __init__(
        self,
        path: Optional[str] = None,
        maxsize: int = 4096,
        backend: str = "auto",
    ):
        self.path = path
        self._q: "queue.Queue" = queue.Queue(maxsize=maxsize)
        self._records = []
        self._native = None
        self._file = None
        if path and backend in ("auto", "native"):
            try:
                from tpu_dialmpc.native import NativeSink

                self._native = NativeSink(path, capacity=maxsize)
            except Exception:
                if backend == "native":
                    raise
        if path and self._native is None:
            self._file = open(path, "w")
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._writer, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------------
    def emit_step(self, t: int, state, infos) -> None:
        """Queue one control step's diagnostics (cheap host transfer)."""
        rews = np.asarray(infos.rews[-1]) if hasattr(infos, "rews") else None
        rec = {
            "t": int(t),
            "time": time.time(),
            "reward": float(np.asarray(state.reward)),
            "done": bool(np.asarray(state.done)),
            "z": float(np.asarray(state.pipeline.qpos[2])),
            "ess": float(np.asarray(infos.ess[-1])) if infos is not None else None,
            "entropy": (
                float(np.asarray(infos.entropy[-1])) if infos is not None else None
            ),
            "rew_mean": float(rews.mean()) if rews is not None else None,
            "rew_max": float(rews.max()) if rews is not None else None,
            "rew_std": float(rews.std()) if rews is not None else None,
        }
        # Q4 weighted state averages (populated when DialConfig.diag_states;
        # placeholders are (1,1) zeros per the C++ — dial-core.h:577-589)
        if getattr(infos, "qbar", None) is not None and infos.qbar.size > infos.qbar.shape[0]:
            qbar = np.asarray(infos.qbar[-1])  # last annealing iteration
            qdbar = np.asarray(infos.qdbar[-1])
            xbar = np.asarray(infos.xbar[-1])
            rec["xbar_end"] = [float(v) for v in xbar[-1]]
            rec["qbar_end_z"] = float(qbar[-1, 2])
            rec["qdbar_end_norm"] = float(np.linalg.norm(qdbar[-1]))
        try:
            self._q.put_nowait(rec)
        except queue.Full:
            pass  # drop rather than stall the control loop

    def emit(self, record: dict) -> None:
        try:
            self._q.put_nowait(record)
        except queue.Full:
            pass

    # ------------------------------------------------------------------
    def _writer(self):
        while not self._stop.is_set() or not self._q.empty():
            try:
                rec = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            self._records.append(rec)
            line = json.dumps(rec)
            if self._native is not None:
                self._native.push(line)
            elif self._file:
                self._file.write(line + "\n")

    def close(self):
        self._stop.set()
        self._thread.join(timeout=5.0)
        if self._native is not None:
            self._native.close()
            self._native = None
        if self._file:
            self._file.flush()
            self._file.close()
            self._file = None

    @property
    def records(self):
        return list(self._records)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
