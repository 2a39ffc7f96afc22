"""ctypes bindings for the native data-plane library (native/dataplane.cpp).

Builds ``libvqa_dataplane.so`` on first use (g++, no external deps) and falls
back silently to NumPy when a compiler isn't available — every caller has a
pure-NumPy path with identical semantics.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libvqa_dataplane.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False
# first-call build/load must be serialized: concurrent callers (e.g. the
# threading HTTP server's first requests) would otherwise race two `make`
# processes onto the same .so and load a partially-written file
_lock = threading.Lock()


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "-s"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _set_argtypes(lib: ctypes.CDLL) -> None:
    """Bind prototypes; raises AttributeError for a stale (pre-threading)
    build that lacks the _mt symbols."""
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.vqa_gather_f16_to_f32_mt.argtypes = [
        ctypes.c_void_p, i64p, ctypes.c_int64, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int32,
    ]
    lib.vqa_gather_rows_u16_mt.argtypes = [
        ctypes.c_void_p, i64p, ctypes.c_int64, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS"),
        ctypes.c_int32,
    ]
    lib.vqa_densify_soft_mt.argtypes = [
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int32,
    ]


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if os.environ.get("VQA_DISABLE_NATIVE"):
        return None  # A/B kill switch (benchmarks, debugging)
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        try:
            _set_argtypes(lib)
        except AttributeError:
            # Stale pre-threading build on disk. Rebuild, but load the fresh
            # binary under a UNIQUE path: dlopen caches by pathname and
            # ctypes never dlcloses, so re-loading _LIB_PATH would hand back
            # the stale in-process handle forever (and previously recursed
            # remove/make/reload until RecursionError).
            import shutil
            import tempfile

            try:
                os.remove(_LIB_PATH)
            except OSError:
                return None
            if not _build():
                return None
            tmp = tempfile.NamedTemporaryFile(
                prefix="vqa_dataplane_", suffix=".so", delete=False
            )
            tmp.close()
            try:
                shutil.copy2(_LIB_PATH, tmp.name)
                lib = ctypes.CDLL(tmp.name)
                _set_argtypes(lib)
                # ctypes can't dlclose, but on Linux unlinking a dlopened
                # .so is safe — without this every process that hits the
                # rebuild path leaks one temp file
                import atexit

                atexit.register(
                    lambda p=tmp.name: os.path.exists(p) and os.remove(p)
                )
            except (OSError, AttributeError):
                return None
        _lib = lib
        return _lib


def num_threads() -> int:
    """Host threads for the row-parallel native kernels.

    ``VQA_NATIVE_THREADS`` overrides; default is the machine's core count
    capped at 16 (the gathers are memory-bandwidth-bound — on TPU-VM hosts
    a handful of threads saturates the channels, and more only adds
    spawn/join latency to every batch).
    """
    env = os.environ.get("VQA_NATIVE_THREADS")
    if env:
        try:
            return max(1, int(env))
        except ValueError:
            pass
    return max(1, min(os.cpu_count() or 1, 16))


def _check_gather_args(src: np.ndarray, rows: np.ndarray) -> np.ndarray:
    """Safety gates in front of the unchecked C kernels: the source must be a
    dense row-major buffer (a strided view would be walked with the wrong
    pitch) and every row index must be in range (the kernel does no bounds
    check — an out-of-range row reads foreign memory or segfaults)."""
    if not src.flags["C_CONTIGUOUS"]:
        raise ValueError("native gather requires a C-contiguous source")
    rows = np.ascontiguousarray(rows, np.int64)
    if len(rows) and (rows.min() < 0 or rows.max() >= src.shape[0]):
        raise IndexError(
            f"row indices out of range [0, {src.shape[0]}) for native gather"
        )
    return rows


def gather_f16_to_f32(
    src: np.ndarray,  # [num_rows, ...] float16 (memmap ok)
    rows: np.ndarray,  # [n] int64
) -> Optional[np.ndarray]:
    """Fused gather+widen; None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    assert src.dtype == np.float16
    rows = _check_gather_args(src, rows)
    row_elems = int(np.prod(src.shape[1:]))
    out = np.empty((len(rows), *src.shape[1:]), np.float32)
    lib.vqa_gather_f16_to_f32_mt(
        src.ctypes.data, rows, len(rows), row_elems,
        out.reshape(len(rows), -1), num_threads(),
    )
    return out


def gather_f16(
    src: np.ndarray,  # [num_rows, ...] float16 (memmap ok)
    rows: np.ndarray,  # [n] int64
) -> Optional[np.ndarray]:
    """Raw f16 row gather (the bf16-training feed: the store dtype ships to
    the device unwidened); None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    assert src.dtype == np.float16
    rows = _check_gather_args(src, rows)
    row_elems = int(np.prod(src.shape[1:]))
    out = np.empty((len(rows), *src.shape[1:]), np.float16)
    lib.vqa_gather_rows_u16_mt(
        src.ctypes.data, rows, len(rows), row_elems,
        out.reshape(len(rows), -1).view(np.uint16), num_threads(),
    )
    return out


def gather_i8(
    src: np.ndarray,  # [num_rows, ...] int8 (memmap ok)
    rows: np.ndarray,  # [n] int64
) -> Optional[np.ndarray]:
    """Raw int8 row gather (the quantized feed). Reuses the u16 memcpy
    kernel by addressing byte PAIRS — rows of 196x2048 int8 are even-sized;
    an odd row size falls back to NumPy. None if the lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    assert src.dtype == np.int8
    row_elems = int(np.prod(src.shape[1:]))
    if row_elems % 2:
        return None
    rows = _check_gather_args(src, rows)
    out = np.empty((len(rows), *src.shape[1:]), np.int8)
    lib.vqa_gather_rows_u16_mt(
        src.ctypes.data, rows, len(rows), row_elems // 2,
        out.reshape(len(rows), -1).view(np.uint16), num_threads(),
    )
    return out


def densify_soft(
    idx: np.ndarray, val: np.ndarray, num_answers: int
) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    idx = np.ascontiguousarray(idx, np.int32)
    val = np.ascontiguousarray(val, np.float32)
    # match the NumPy fallback's semantics exactly: it raises IndexError on
    # idx >= num_answers (an artifact prepared against a larger vocab),
    # while the C kernel would silently drop those entries — the two paths
    # must fail the same way
    if idx.size and idx.max() >= num_answers:
        raise IndexError(
            f"soft-answer index {int(idx.max())} out of range for "
            f"num_answers={num_answers} — the QA artifact was prepared "
            "against a larger answer vocabulary"
        )
    n, width = idx.shape
    out = np.zeros((n, num_answers), np.float32)
    lib.vqa_densify_soft_mt(idx, val, n, width, num_answers, out,
                            num_threads())
    return out
