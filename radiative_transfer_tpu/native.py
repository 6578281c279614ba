"""ctypes bindings for the native runtime I/O library (native/rtio.cc).

The framework's host-side data path — deck parsing, opacity-table reads,
and the large CSV dumps — is implemented in C++ like the reference's
(reference: src/param.cpp, src/ParameterHandler.cpp:136-198,
src/main.cc:37-57), with this module as the thin boundary. Every entry
point has a pure-Python fallback (config/config.py, utils/io.py) with
identical semantics; callers use `available()` to pick, so the package
works before the library is built and on hosts without a toolchain.

Build with `make -C native` or `ensure_built()`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_PKG_DIR, "_native", "librtio.so")
_NATIVE_SRC_DIR = os.path.join(os.path.dirname(_PKG_DIR), "native")

_FIELD_SEP = "\x1f"
_RECORD_SEP = "\x1e"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def ensure_built(quiet: bool = True) -> bool:
    """Compile librtio.so if missing and a toolchain exists. Returns
    whether the library file is present afterwards."""
    if os.path.exists(_LIB_PATH):
        return True
    if not os.path.isdir(_NATIVE_SRC_DIR):
        return False
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_SRC_DIR],
            check=True,
            capture_output=quiet,
        )
    except (OSError, subprocess.CalledProcessError):
        return False
    return os.path.exists(_LIB_PATH)


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) and not ensure_built():
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _load_failed = True
            return None

        lib.rtio_parse_deck.argtypes = [ctypes.c_char_p]
        lib.rtio_parse_deck.restype = ctypes.c_void_p
        lib.rtio_read_table.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64)
        ]
        lib.rtio_read_table.restype = ctypes.c_void_p
        for name in ("rtio_write_matrix",):
            fn = getattr(lib, name)
            fn.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64, ctypes.c_int64,
            ]
            fn.restype = ctypes.c_int
        lib.rtio_write_vector.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_double), ctypes.c_int64
        ]
        lib.rtio_write_vector.restype = ctypes.c_int
        lib.rtio_write_psi.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.rtio_write_psi.restype = ctypes.c_int
        lib.rtio_free.argtypes = [ctypes.c_void_p]
        lib.rtio_free.restype = None
        lib.rtio_abi_version.restype = ctypes.c_int
        if lib.rtio_abi_version() != 1:
            _load_failed = True
            return None
        _lib = lib
        return _lib


def available() -> bool:
    """True iff the native library is loadable (building it on demand)."""
    return _load() is not None


# ---------------------------------------------------------------------------
# Readers
# ---------------------------------------------------------------------------

def parse_deck(path: str) -> List[Tuple[str, str]]:
    """(key, value) records of a .prm deck, file order, first-wins.
    Raises FileNotFoundError/RuntimeError like the Python loader would."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    ptr = lib.rtio_parse_deck(os.fsencode(path))
    if not ptr:
        raise FileNotFoundError(path)
    try:
        raw = ctypes.string_at(ptr).decode("utf-8", errors="surrogateescape")
    finally:
        lib.rtio_free(ptr)
    out: List[Tuple[str, str]] = []
    for rec in raw.split(_RECORD_SEP):
        if not rec:
            continue
        key, _, value = rec.partition(_FIELD_SEP)
        out.append((key, value))
    return out


def parse_deck_dict(path: str) -> Dict[str, str]:
    return dict(parse_deck(path))


def read_table(path: str) -> np.ndarray:
    """Whitespace-separated doubles; stops at the first bad token."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    n = ctypes.c_int64()
    ptr = lib.rtio_read_table(os.fsencode(path), ctypes.byref(n))
    if not ptr:
        raise FileNotFoundError(path)
    try:
        if n.value == 0:
            return np.empty(0, dtype=np.float64)
        buf = ctypes.cast(
            ptr, ctypes.POINTER(ctypes.c_double * n.value)
        ).contents
        return np.frombuffer(bytearray(buf), dtype=np.float64).copy()
    finally:
        lib.rtio_free(ptr)


# ---------------------------------------------------------------------------
# Writers
# ---------------------------------------------------------------------------

def _as_c_double(a: np.ndarray):
    a = np.ascontiguousarray(a, dtype=np.float64)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def write_matrix(path: str, m) -> None:
    lib = _load()
    assert lib is not None, "native library unavailable"
    m = np.atleast_2d(np.asarray(m, dtype=np.float64))
    a, p = _as_c_double(m)
    rc = lib.rtio_write_matrix(os.fsencode(path), p, a.shape[0], a.shape[1])
    if rc != 0:
        raise OSError(f"rtio_write_matrix failed for {path}")


def write_vector(path: str, v) -> None:
    lib = _load()
    assert lib is not None, "native library unavailable"
    a, p = _as_c_double(np.asarray(v, dtype=np.float64).reshape(-1))
    rc = lib.rtio_write_vector(os.fsencode(path), p, a.size)
    if rc != 0:
        raise OSError(f"rtio_write_vector failed for {path}")


def write_psi(path: str, psi) -> None:
    """(M, G, N) C-order tensor -> the interleaved n*G+g column layout."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    psi = np.asarray(psi, dtype=np.float64)
    assert psi.ndim == 3
    a, p = _as_c_double(psi)
    rc = lib.rtio_write_psi(
        os.fsencode(path), p, a.shape[0], a.shape[1], a.shape[2]
    )
    if rc != 0:
        raise OSError(f"rtio_write_psi failed for {path}")
