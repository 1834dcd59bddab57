"""ctypes binding for the native TFRecord scanner (native/tfrecord_index.cc).

Loads `libtfrecord_index.so` if present, builds it with g++ on first use
when possible, and degrades to None so callers fall back to the
pure-Python parser. Keeps the framework import-safe on hosts without a
toolchain.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional, Tuple

logger = logging.getLogger(__name__)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "tfrecord_index.cc")
_LIB = os.path.join(_REPO_ROOT, "native", "libtfrecord_index.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    if not os.path.exists(_SRC):
        return False
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-msse4.2", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        # Retry without SSE4.2 (portable table-driven CRC).
        try:
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", _SRC,
                            "-o", _LIB], check=True, capture_output=True)
            return True
        except Exception:
            return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) and not _build():
            logger.debug("native tfrecord scanner unavailable")
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.tfr_index.restype = ctypes.c_longlong
        lib.tfr_index.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_ulonglong)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_ulonglong))]
        lib.tfr_free.argtypes = [ctypes.POINTER(ctypes.c_ulonglong)]
        lib.tfr_crc32c.restype = ctypes.c_uint
        lib.tfr_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_ulonglong]
        _lib = lib
        return _lib


def index_records(path: str, verify_crc: bool = True
                  ) -> Optional[List[Tuple[int, int]]]:
    """Native scan: [(payload_offset, length), ...] or None if the
    native library is unavailable. Raises IOError on corruption."""
    lib = get_lib()
    if lib is None:
        return None
    offs = ctypes.POINTER(ctypes.c_ulonglong)()
    lens = ctypes.POINTER(ctypes.c_ulonglong)()
    n = lib.tfr_index(path.encode(), int(verify_crc),
                      ctypes.byref(offs), ctypes.byref(lens))
    if n == -1:
        raise IOError(f"cannot open {path}")
    if n == -2:
        raise IOError(f"corrupt tfrecord framing/CRC in {path}")
    try:
        return [(offs[i], lens[i]) for i in range(n)]
    finally:
        lib.tfr_free(offs)
        lib.tfr_free(lens)


def crc32c(data: bytes) -> Optional[int]:
    lib = get_lib()
    if lib is None:
        return None
    return int(lib.tfr_crc32c(data, len(data)))
