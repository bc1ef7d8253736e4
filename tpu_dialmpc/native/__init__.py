"""Native (C++) runtime components, loaded via ctypes.

`load_telemetry_sink()` builds (if needed) and loads the lock-free JSONL sink;
returns None when no toolchain is available so callers fall back to the
pure-Python writer.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

_DIR = pathlib.Path(__file__).resolve().parent
_LIB = _DIR / "libtelemetry_sink.so"
_lib_handle = None


def load_telemetry_sink():
    global _lib_handle
    if _lib_handle is not None:
        return _lib_handle
    if not _LIB.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError:
        return None
    lib.ts_create.restype = ctypes.c_void_p
    lib.ts_create.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.ts_push.restype = ctypes.c_int
    lib.ts_push.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int]
    lib.ts_accepted.restype = ctypes.c_long
    lib.ts_accepted.argtypes = [ctypes.c_void_p]
    lib.ts_dropped.restype = ctypes.c_long
    lib.ts_dropped.argtypes = [ctypes.c_void_p]
    lib.ts_close.restype = None
    lib.ts_close.argtypes = [ctypes.c_void_p]
    _lib_handle = lib
    return lib


class NativeSink:
    """Thin ctypes wrapper over the C++ ring-buffer sink."""

    def __init__(self, path: str, capacity: int = 8192):
        lib = load_telemetry_sink()
        if lib is None:
            raise RuntimeError("native telemetry sink unavailable")
        self._lib = lib
        self._h = lib.ts_create(str(path).encode(), capacity)

    def push(self, line: str) -> bool:
        data = line.encode()
        return bool(self._lib.ts_push(self._h, data, len(data)))

    @property
    def accepted(self) -> int:
        return self._lib.ts_accepted(self._h)

    @property
    def dropped(self) -> int:
        return self._lib.ts_dropped(self._h)

    def close(self):
        if self._h:
            self._lib.ts_close(self._h)
            self._h = None
