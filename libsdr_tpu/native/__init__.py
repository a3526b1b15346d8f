"""Native host runtime (C++ via ctypes) with numpy fallbacks.

Builds ``src/sdr_native.cc`` on first use (g++ is in the image; pybind11 is
not, so the ABI is plain C + ctypes).  Everything here has a pure-numpy
fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "src", "sdr_native.cc")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    out = os.path.join(_HERE, "_sdr_native.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(_SRC):
        return out
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
             _SRC, "-o", out, "-lpthread"],
            check=True, capture_output=True, timeout=120)
        return out
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    path = _build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    c_i64, c_p = ctypes.c_int64, ctypes.c_void_p
    lib.u8_iq_to_planar_f32.argtypes = [c_p, c_i64, c_p, c_p]
    lib.s16_iq_to_planar_f32.argtypes = [c_p, c_i64, c_p, c_p]
    lib.s16_to_f32.argtypes = [c_p, c_i64, c_p]
    lib.f32_planar_to_s16_interleaved.argtypes = [c_p, c_p, c_i64, c_p]
    lib.ring_create.argtypes = [c_i64]
    lib.ring_create.restype = c_p
    lib.ring_destroy.argtypes = [c_p]
    lib.ring_available.argtypes = [c_p]
    lib.ring_available.restype = c_i64
    lib.ring_space.argtypes = [c_p]
    lib.ring_space.restype = c_i64
    lib.ring_put.argtypes = [c_p, c_p, c_i64]
    lib.ring_put.restype = c_i64
    lib.ring_take.argtypes = [c_p, c_p, c_i64]
    lib.ring_take.restype = c_i64
    lib.ring_eos.argtypes = [c_p]
    lib.ring_eos.restype = ctypes.c_int
    lib.ring_set_eos.argtypes = [c_p]
    lib.pump_start.argtypes = [ctypes.c_char_p, c_p, c_i64]
    lib.pump_start.restype = c_p
    lib.pump_stop.argtypes = [c_p]
    lib.pocsag_decode.argtypes = [c_p, c_i64, c_p, c_p, c_i64, c_i64]
    lib.pocsag_decode.restype = c_i64
    lib.ax25_decode.argtypes = [c_p, c_i64, c_p, c_p, c_i64, c_i64]
    lib.ax25_decode.restype = c_i64
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


# ---------------------------------------------------------------------------
# Converters (numpy fallback mirrors the C++ exactly)
# ---------------------------------------------------------------------------

def u8_iq_to_planar(src: np.ndarray):
    """Interleaved u8 IQ (rtl_sdr wire format, reference:
    src/rtlsource.cc:141-145) -> (re, im) float32 planes."""
    src = np.ascontiguousarray(src, dtype=np.uint8)
    n = len(src) // 2
    lib = get_lib()
    if lib is not None:
        re = np.empty(n, np.float32)
        im = np.empty(n, np.float32)
        lib.u8_iq_to_planar_f32(_ptr(src), n, _ptr(re), _ptr(im))
        return re, im
    f = (src.astype(np.float32) - 128.0) / 128.0
    return np.ascontiguousarray(f[0::2]), np.ascontiguousarray(f[1::2])


def u8_iq_to_planar_bf16(src: np.ndarray):
    """Interleaved u8 IQ -> (re, im) bfloat16 planes (as uint16 bit
    patterns; view with ml_dtypes/jnp.bfloat16).  Lossless for 8-bit
    sources and HALF the ingest/HBM traffic of f32 — the storage format
    the fused Pallas kernels consume directly
    (AutoCast(compute='bfloat16') semantics at the native ingest)."""
    src = np.ascontiguousarray(src, dtype=np.uint8)
    n = len(src) // 2
    lib = get_lib()
    if lib is not None and hasattr(lib, "u8_iq_to_planar_bf16"):
        re = np.empty(n, np.uint16)
        im = np.empty(n, np.uint16)
        lib.u8_iq_to_planar_bf16(_ptr(src), n, _ptr(re), _ptr(im))
        return re, im
    # numpy fallback: truncate f32 to its upper 16 bits (exact for these
    # values, see the C++ comment)
    f = ((src.astype(np.float32) - 128.0) / 128.0).view(np.uint32)
    h = (f >> 16).astype(np.uint16)
    return np.ascontiguousarray(h[0::2]), np.ascontiguousarray(h[1::2])


def s16_iq_to_planar(src: np.ndarray):
    src = np.ascontiguousarray(src, dtype=np.int16)
    n = len(src) // 2
    lib = get_lib()
    if lib is not None:
        re = np.empty(n, np.float32)
        im = np.empty(n, np.float32)
        lib.s16_iq_to_planar_f32(_ptr(src), n, _ptr(re), _ptr(im))
        return re, im
    f = src.astype(np.float32) / 32768.0
    return np.ascontiguousarray(f[0::2]), np.ascontiguousarray(f[1::2])


# ---------------------------------------------------------------------------
# Ring buffer + file pump
# ---------------------------------------------------------------------------

class RingBuffer:
    """SPSC byte ring (native when available; numpy/deque fallback).
    The analog of the reference's RawRingBuffer (src/buffer.hh:356-541)."""

    def __init__(self, capacity: int):
        self.capacity = int(capacity)
        self._lib = get_lib()
        if self._lib is not None:
            self._h = self._lib.ring_create(self.capacity)
        else:
            self._buf = bytearray()
            self._eos = False

    def put(self, data: np.ndarray) -> int:
        data = np.ascontiguousarray(data).view(np.uint8).reshape(-1)
        if self._lib is not None:
            return int(self._lib.ring_put(self._h, _ptr(data), len(data)))
        if len(self._buf) + len(data) > self.capacity:
            return 0
        self._buf += data.tobytes()
        return len(data)

    def take(self, n: int) -> Optional[np.ndarray]:
        if self._lib is not None:
            out = np.empty(n, np.uint8)
            got = int(self._lib.ring_take(self._h, _ptr(out), n))
            return out if got == n else None
        if len(self._buf) < n:
            return None
        out = np.frombuffer(bytes(self._buf[:n]), np.uint8)
        del self._buf[:n]
        return out

    @property
    def available(self) -> int:
        if self._lib is not None:
            return int(self._lib.ring_available(self._h))
        return len(self._buf)

    @property
    def eos(self) -> bool:
        if self._lib is not None:
            return bool(self._lib.ring_eos(self._h))
        return self._eos

    def set_eos(self) -> None:
        if self._lib is not None:
            self._lib.ring_set_eos(self._h)
        else:
            self._eos = True

    def close(self) -> None:
        if self._lib is not None and self._h:
            self._lib.ring_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class FilePump:
    """Ingest thread streaming a capture file into a RingBuffer — the analog
    of BlockingSource's thread (reference: src/node.cc:154-176).  Native
    std::thread when available, Python thread otherwise."""

    def __init__(self, path: str, ring: RingBuffer, chunk: int = 1 << 18):
        self.ring = ring
        self._lib = get_lib()
        if self._lib is not None and ring._lib is not None:
            self._h = self._lib.pump_start(path.encode(), ring._h, chunk)
            if not self._h:
                raise FileNotFoundError(path)
            self._thread = None
        else:
            import threading
            self._h = None
            self._stop = False

            def run():
                with open(path, "rb") as f:
                    while not self._stop:
                        buf = f.read(chunk)
                        if not buf:
                            break
                        arr = np.frombuffer(buf, np.uint8)
                        off = 0
                        while off < len(arr) and not self._stop:
                            put = ring.put(arr[off:])
                            if put == 0:
                                import time
                                time.sleep(0.001)
                            else:
                                off += put
                ring.set_eos()

            self._thread = threading.Thread(target=run, daemon=True)
            self._thread.start()

    def stop(self) -> None:
        if self._h is not None:
            self._lib.pump_stop(self._h)
            self._h = None
        elif self._thread is not None:
            self._stop = True
            self._thread.join()
            self._thread = None
