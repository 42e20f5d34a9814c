"""ctypes bindings for the native host-runtime library (built on demand).

``Mailbox`` — wait-free seqlock SPSC blob handoff (MPC policy -> control
loop; the RealtimeBuffer / MRT-policy-mutex role of the reference).
``PeriodicTimer`` — absolute-deadline executor (ocs2 executeAndSleep role).

Falls back to pure-Python equivalents when no C++ toolchain is available so
the framework stays importable anywhere.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
import time

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "src", "qm_native.cpp")
_SO = os.path.join(_HERE, "libqm_native.so")

_lib = None
_lib_err = None


def _build():
    # Portable baseline ISA on purpose: the .so is rebuilt on demand per
    # machine, but a stale binary may survive a copy between hosts —
    # -march=native there would SIGILL on a CPU lacking the build host's
    # extensions instead of falling back.
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
        _SRC, "-o", _SO, "-lpthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def load():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _lib_err
    if _lib is not None or _lib_err is not None:
        return _lib
    try:
        if (not os.path.exists(_SO)) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            _build()
        try:
            lib = ctypes.CDLL(_SO)
            lib.qm_mailbox_create  # trial symbol lookup before trusting it
        except OSError:
            _build()  # stale/foreign binary: rebuild once, then retry
            lib = ctypes.CDLL(_SO)
        lib.qm_mailbox_create.restype = ctypes.c_void_p
        lib.qm_mailbox_create.argtypes = [ctypes.c_uint64]
        lib.qm_mailbox_destroy.argtypes = [ctypes.c_void_p]
        lib.qm_mailbox_write.restype = ctypes.c_uint64
        lib.qm_mailbox_write.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint64
        ]
        lib.qm_mailbox_read.restype = ctypes.c_uint64
        lib.qm_mailbox_read.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.qm_mailbox_seq.restype = ctypes.c_uint64
        lib.qm_mailbox_seq.argtypes = [ctypes.c_void_p]
        lib.qm_timer_create.restype = ctypes.c_void_p
        lib.qm_timer_create.argtypes = [ctypes.c_int64]
        lib.qm_timer_destroy.argtypes = [ctypes.c_void_p]
        lib.qm_timer_wait.restype = ctypes.c_int64
        lib.qm_timer_wait.argtypes = [ctypes.c_void_p]
        for f in ("qm_timer_ticks", "qm_timer_overruns"):
            getattr(lib, f).restype = ctypes.c_uint64
            getattr(lib, f).argtypes = [ctypes.c_void_p]
        lib.qm_timer_worst_lag_ns.restype = ctypes.c_int64
        lib.qm_timer_worst_lag_ns.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception as e:  # toolchain missing, etc.
        _lib_err = e
        _lib = None
    return _lib


class Mailbox:
    """SPSC latest-value mailbox for fixed-capacity byte blobs."""

    def __init__(self, capacity: int):
        self.capacity = capacity
        lib = load()
        if lib is not None:
            self._lib = lib
            self._h = ctypes.c_void_p(lib.qm_mailbox_create(capacity))
            self._buf = ctypes.create_string_buffer(capacity)
            self._fallback = None
        else:
            self._lib = None
            self._fallback = (threading.Lock(), [0, b""])

    def write(self, blob: bytes) -> int:
        if self._lib is not None:
            return int(self._lib.qm_mailbox_write(self._h, blob, len(blob)))
        lock, cell = self._fallback
        with lock:
            cell[0] += 2
            cell[1] = blob
            return cell[0]

    def read(self):
        """-> (seq, blob) of the latest publication; (0, b'') if none yet."""
        if self._lib is not None:
            out_len = ctypes.c_uint64(0)
            seq = int(
                self._lib.qm_mailbox_read(
                    self._h, self._buf, self.capacity, ctypes.byref(out_len)
                )
            )
            if seq == 0:
                return 0, b""
            return seq, self._buf.raw[: out_len.value]
        lock, cell = self._fallback
        with lock:
            return cell[0], cell[1]

    def __del__(self):
        if getattr(self, "_lib", None) is not None and self._h:
            self._lib.qm_mailbox_destroy(self._h)
            self._h = None


class PeriodicTimer:
    """Absolute-deadline periodic sleeper with overrun stats."""

    def __init__(self, period_s: float):
        self.period_s = period_s
        lib = load()
        if lib is not None:
            self._lib = lib
            self._h = ctypes.c_void_p(lib.qm_timer_create(int(period_s * 1e9)))
        else:
            self._lib = None
            self._next = time.monotonic() + period_s
            self._ticks = 0
            self._overruns = 0

    def wait(self) -> float:
        """Sleep until the next deadline; returns lag in seconds."""
        if self._lib is not None:
            return self._lib.qm_timer_wait(self._h) * 1e-9
        now = time.monotonic()
        lag = now - self._next
        if lag > self.period_s:
            self._overruns += 1
            self._next = now
        else:
            time.sleep(max(self._next - now, 0.0))
        self._next += self.period_s
        self._ticks += 1
        return max(lag, 0.0)

    @property
    def ticks(self):
        return int(self._lib.qm_timer_ticks(self._h)) if self._lib else self._ticks

    @property
    def overruns(self):
        return int(self._lib.qm_timer_overruns(self._h)) if self._lib else self._overruns

    def __del__(self):
        if getattr(self, "_lib", None) is not None and self._h:
            self._lib.qm_timer_destroy(self._h)
            self._h = None
