"""Asynchronous MPC/control execution (the reference's threading model).

QMController spawns a dedicated MPC thread running advanceMpc at 100 Hz while
the 500 Hz ros_control update consumes the latest policy under a mutex
(QMController.cpp:310-335). Here:

- the MPC thread runs the jitted SQP solve and publishes each policy snapshot
  through the native seqlock ``Mailbox`` (wait-free for the solver);
- the control thread paces itself with the native ``PeriodicTimer``, reads
  the newest policy (lock-free), and runs the jitted controller tick;
- both sides keep RepeatedTimer stats, mirroring the reference's shutdown
  benchmark report.

Device work releases the GIL, so the two Python threads genuinely overlap
(solve on TPU/CPU backend while the control tick interpolates the previous
policy) — the same pipeline parallelism as the reference's MPC thread.
"""
from __future__ import annotations

import pickle
import threading
from typing import Callable, Optional

import numpy as np

from ..native import Mailbox, PeriodicTimer
from .metrics import Metrics
from .mrt import PolicyStore


class PolicyMailbox:
    """Typed wrapper: PolicyStore snapshots over the byte mailbox."""

    def __init__(self, n_nodes: int, capacity: Optional[int] = None):
        # policy = times (N+1) + X (N+1,30) + U (N,30) float32/64 + header
        capacity = capacity or (n_nodes * 70 * 8 + 4096)
        self._mb = Mailbox(capacity)

    def publish(self, policy: PolicyStore) -> int:
        blob = pickle.dumps(
            (
                np.asarray(policy.times),
                np.asarray(policy.X),
                np.asarray(policy.U),
            ),
            protocol=pickle.HIGHEST_PROTOCOL,
        )
        return self._mb.write(blob)

    def latest(self):
        seq, blob = self._mb.read()
        if seq == 0:
            return 0, None
        times, X, U = pickle.loads(blob)
        return seq, PolicyStore(times=times, X=X, U=U)


class AsyncMpcLoop:
    """Background MPC thread: solve_fn() -> PolicyStore at mpc_hz."""

    def __init__(self, solve_fn: Callable[[], PolicyStore], mpc_hz: float,
                 mailbox: PolicyMailbox, metrics: Optional[Metrics] = None):
        self.solve_fn = solve_fn
        self.mailbox = mailbox
        self.metrics = metrics or Metrics()
        self.period = 1.0 / mpc_hz
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.error: Optional[BaseException] = None

    def start(self):
        self._thread = threading.Thread(target=self._run, daemon=True, name="mpc")
        self._thread.start()

    def _run(self):
        timer = PeriodicTimer(self.period)
        t = self.metrics.timer("mpc_solve")
        try:
            while not self._stop.is_set():
                t.start()
                policy = self.solve_fn()
                t.stop()
                self.mailbox.publish(policy)
                self.metrics.count("mpc_solves")
                timer.wait()
        except BaseException as e:  # mirror the reference's try/catch-and-halt
            self.error = e

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5.0)
