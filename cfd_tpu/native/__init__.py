"""Native (C++) runtime components, loaded via ctypes.

Built on demand with the toolchain's g++ (no pybind11 in the image; plain C
ABI + ctypes). Every native path has a pure-numpy fallback so the framework
works without a compiler; `available()` reports which is active.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build(src: Path, so: Path) -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", str(src), "-o", str(so)],
            check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        src = _HERE / "vtk_text.cpp"
        so = _HERE / "_vtk_text.so"
        if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
            if not _build(src, so):
                return None
        try:
            lib = ctypes.CDLL(str(so))
        except OSError:
            return None
        lib.fmt_scalar_fixed6.restype = ctypes.c_long
        lib.fmt_scalar_fixed6.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_long,
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long]
        lib.fmt_vector_fixed6.restype = ctypes.c_long
        lib.fmt_vector_fixed6.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_long, ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def _as_f64(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.float64).ravel()


def _mask_ptr(mask):
    if mask is None:
        return None
    m = np.ascontiguousarray(mask, dtype=np.uint8).ravel()
    return m, m.ctypes.data_as(ctypes.c_void_p)


# Worst-case bytes for one "%.6f\n" double: sign + 309 integral digits +
# '.' + 6 decimals + '\n' (matches kScratch in vtk_text.cpp).
_WORST_SCALAR = 336


def fmt_scalar_fixed6(x: np.ndarray, literal_zero: np.ndarray | None = None) -> str | None:
    """'%.6f\\n' lines (optionally literal '0.0' rows); None if no native lib."""
    lib = _load()
    if lib is None:
        return None
    xf = _as_f64(x)
    n = xf.size
    keep = _mask_ptr(literal_zero)
    # Common case: 40 bytes/value; diverged fields (|x| >= ~1e32) overflow
    # that, the C side reports -1, and we retry with worst-case slots.
    for slot in (40, _WORST_SCALAR):
        cap = n * slot
        buf = ctypes.create_string_buffer(cap)
        written = lib.fmt_scalar_fixed6(
            xf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
            keep[1] if keep else None, buf, cap)
        if written >= 0:
            return buf.raw[:written].decode("ascii")
    raise RuntimeError("fmt_scalar_fixed6 overflow at worst-case sizing")


def fmt_vector_fixed6(u: np.ndarray, v: np.ndarray,
                      literal_zero: np.ndarray | None = None) -> str | None:
    lib = _load()
    if lib is None:
        return None
    uf, vf = _as_f64(u), _as_f64(v)
    n = uf.size
    keep = _mask_ptr(literal_zero)
    for slot in (84, 2 * _WORST_SCALAR):
        cap = n * slot
        buf = ctypes.create_string_buffer(cap)
        written = lib.fmt_vector_fixed6(
            uf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            vf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
            keep[1] if keep else None, buf, cap)
        if written >= 0:
            return buf.raw[:written].decode("ascii")
    raise RuntimeError("fmt_vector_fixed6 overflow at worst-case sizing")
