"""Build + load the native banded-SW kernel (native/swalign.cpp) via ctypes.

Compiled lazily on first use with g++ -O3 -fopenmp; cached next to the
source.  If no compiler is available the NumPy path is used instead.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path

log = logging.getLogger("savont")

_REPO = Path(__file__).resolve().parent.parent.parent
_SRC = _REPO / "native" / "swalign.cpp"
_SO = _REPO / "native" / "swalign.so"
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _vector_width_flags() -> list[str]:
    """-mprefer-vector-width=512 where the CPU has AVX-512BW: the int16
    lane-block kernels (PBLK=32) measure ~7% faster with full-width
    vectors there, while gcc's default prefers 256-bit."""
    try:
        with open("/proc/cpuinfo") as f:
            if "avx512bw" in f.read():
                return ["-mprefer-vector-width=512"]
    except OSError:
        pass
    return []


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", *_vector_width_flags(),
        "-fopenmp", "-shared", "-fPIC",
        str(_SRC), "-o", str(_SO),
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (FileNotFoundError, subprocess.TimeoutExpired):
        return False
    if r.returncode != 0:
        log.warning("native build failed: %s", r.stderr[-500:])
        return False
    return True


_EXTRA_CACHE: dict[str, Path | None] = {}


def build_extra(
    name: str, extra_link: list[str] | None = None,
    extra_cflags: list[str] | None = None,
) -> Path | None:
    """Build native/<name>.cpp -> native/<name>.so; returns the path or None."""
    if name in _EXTRA_CACHE:
        return _EXTRA_CACHE[name]
    if os.environ.get("SAVONT_NO_NATIVE"):
        _EXTRA_CACHE[name] = None
        return None
    src = _REPO / "native" / f"{name}.cpp"
    so = _REPO / "native" / f"{name}.so"
    if not src.exists():
        _EXTRA_CACHE[name] = None
        return None
    if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
        cmd = [
            "g++", "-O3", "-march=native", *_vector_width_flags(),
            *(extra_cflags or []),
            "-shared", "-fPIC", str(src), "-o", str(so),
        ]
        cmd += extra_link or []
        try:
            r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        except (FileNotFoundError, subprocess.TimeoutExpired):
            _EXTRA_CACHE[name] = None
            return None
        if r.returncode != 0:
            log.warning("native build of %s failed: %s", name, r.stderr[-500:])
            _EXTRA_CACHE[name] = None
            return None
    _EXTRA_CACHE[name] = so
    return so


def get_lib():
    """Return the loaded shared library or None."""
    global _LIB, _TRIED
    if _LIB is not None:
        return _LIB
    if _TRIED:
        return None
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("SAVONT_NO_NATIVE"):
            return None
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            if not _SRC.exists() or not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError as e:
            log.warning("failed to load native kernel: %s", e)
            return None
        lib.sw_banded_batch.restype = None
        lib.sw_banded_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint32), ctypes.c_int32,
            ctypes.c_int32,
        ]
        lib.sw_tb_batch.restype = None
        lib.sw_tb_batch.argtypes = lib.sw_banded_batch.argtypes
        lib.sw_nm_batch.restype = None
        lib.sw_nm_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ]
        lib.sw_nm_batch_nc.restype = None
        lib.sw_nm_batch_nc.argtypes = lib.sw_nm_batch.argtypes
        _LIB = lib
        log.info("native banded-SW kernel loaded (%s)", _SO.name)
        return _LIB
