"""ctypes bindings for the native C++ components under native/:

* `tfrecord_index.cc` — TFRecord framing/CRC scanner (ETL stage).
* `batch_assembler.cc` — fused gather+transpose+quantize training-batch
  assembler (input pipeline hot path).

Each library is loaded if present, built with g++ on first use when
possible, and degrades to None so callers fall back to the pure-Python
path. Keeps the framework import-safe on hosts without a toolchain.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

logger = logging.getLogger(__name__)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "tfrecord_index.cc")
_LIB = os.path.join(_REPO_ROOT, "native", "libtfrecord_index.so")
_ASM_SRC = os.path.join(_REPO_ROOT, "native", "batch_assembler.cc")
_ASM_LIB = os.path.join(_REPO_ROOT, "native", "libbatch_assembler.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False
_asm_lib: Optional[ctypes.CDLL] = None
_asm_tried = False


def _try_build(src: str, lib: str,
               flag_sets: Sequence[Sequence[str]]) -> bool:
    """g++-compile `src` -> `lib`, trying each extra-flag set in order
    (first success wins; later sets are portability fallbacks)."""
    if not os.path.exists(src):
        return False
    for extra in flag_sets:
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", *extra, src, "-o", lib],
                check=True, capture_output=True)
            return True
        except (subprocess.CalledProcessError, FileNotFoundError):
            continue
    return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        # -msse4.2 enables the hardware CRC32C path; the portable
        # table-driven fallback compiles without it.
        if not os.path.exists(_LIB) and not _try_build(
                _SRC, _LIB, [["-msse4.2"], []]):
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


def get_assembler_lib() -> Optional[ctypes.CDLL]:
    global _asm_lib, _asm_tried
    with _lock:
        if _asm_lib is not None or _asm_tried:
            return _asm_lib
        _asm_tried = True
        if not os.path.exists(_ASM_LIB) and not _try_build(
                _ASM_SRC, _ASM_LIB, [["-fopenmp"], []]):
            logger.debug("native batch assembler unavailable")
            return None
        try:
            lib = ctypes.CDLL(_ASM_LIB)
        except OSError:
            return None
        i64 = ctypes.c_longlong
        lib.pivp_assemble_f32.restype = None
        lib.pivp_assemble_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, i64, i64, i64, i64,
            ctypes.c_void_p]
        lib.pivp_assemble_u8.restype = None
        lib.pivp_assemble_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, i64, i64, i64, i64,
            ctypes.c_void_p]
        _asm_lib = lib
        return _asm_lib


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
