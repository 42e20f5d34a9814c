import threading
import time

import numpy as np

from qm_door_tpu.native import Mailbox, PeriodicTimer, load
from qm_door_tpu.runtime.async_runner import AsyncMpcLoop, PolicyMailbox
from qm_door_tpu.runtime.mrt import PolicyStore


def test_native_lib_loads():
    assert load() is not None, "g++ toolchain expected in this image"


def test_mailbox_roundtrip():
    mb = Mailbox(256)
    assert mb.read() == (0, b"")
    s = mb.write(b"abc")
    assert s > 0
    seq, blob = mb.read()
    assert blob == b"abc" and seq == s
    s2 = mb.write(b"defg")
    assert s2 > s
    assert mb.read()[1] == b"defg"


def test_mailbox_no_torn_reads():
    mb = Mailbox(4096)
    payloads = [bytes([i % 256]) * 1024 for i in range(500)]

    def writer():
        for p in payloads:
            mb.write(p)

    t = threading.Thread(target=writer)
    t.start()
    while t.is_alive():
        seq, blob = mb.read()
        if seq:
            assert len(set(blob)) <= 1, "torn read detected"
    t.join()


def test_periodic_timer_rate():
    pt = PeriodicTimer(0.001)
    t0 = time.monotonic()
    for _ in range(50):
        pt.wait()
    elapsed = time.monotonic() - t0
    assert 0.04 < elapsed < 0.30


def test_policy_mailbox_and_async_loop():
    mbox = PolicyMailbox(n_nodes=8)
    times = np.linspace(0, 0.1, 8)
    calls = [0]

    def solve():
        calls[0] += 1
        return PolicyStore(
            times=times + calls[0],
            X=np.full((8, 30), float(calls[0])),
            U=np.zeros((7, 30)),
        )

    loop = AsyncMpcLoop(solve, mpc_hz=200.0, mailbox=mbox)
    loop.start()
    time.sleep(0.2)
    seq, policy = mbox.latest()
    loop.stop()
    assert loop.error is None
    assert seq > 0 and policy is not None
    assert calls[0] >= 5
    # latest snapshot is self-consistent (all X entries from the same solve)
    assert len(set(np.asarray(policy.X).ravel().tolist())) == 1
