"""ctypes wrapper around the native FASTA codec (lazy-built C++).

Builds ``_fastacodec.so`` from ``fastacodec.cpp`` with the system g++ on first
use (no compiler at import time -> Python fallback in ``io/fasta.py``).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import tempfile
import threading
from typing import List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fastacodec.cpp")
_SO = os.path.join(_DIR, "_fastacodec.so")

_LIB = None
_LOCK = threading.Lock()
_BUILD_FAILED = False


def _build() -> Optional[str]:
    """Compile the codec if needed; returns the .so path or None."""
    global _BUILD_FAILED
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        with tempfile.NamedTemporaryFile(
            suffix=".so", dir=_DIR, delete=False
        ) as tmp:
            tmp_path = tmp.name
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-fPIC", "-shared", _SRC, "-o", tmp_path],
            check=True,
            capture_output=True,
        )
        os.replace(tmp_path, _SO)
        return _SO
    except Exception as exc:  # pragma: no cover - depends on toolchain
        logger.info("native FASTA codec unavailable (%s)", exc)
        _BUILD_FAILED = True
        return None


def _get_lib():
    global _LIB
    with _LOCK:
        if _LIB is not None or _BUILD_FAILED:
            return _LIB
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.fasta_encode.argtypes = (
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int8),
            ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int8)),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int64),
        )
        lib.fasta_encode.restype = ctypes.c_int
        lib.fasta_free.argtypes = (ctypes.c_void_p,)
        lib.fasta_free.restype = None
        _LIB = lib
        return _LIB


def available() -> bool:
    return _get_lib() is not None


_ERRORS = {
    -1: "cannot open file",
    -2: "no sequences found",
    -3: "alignment sequences have differing lengths",
    -4: "sequence data before first '>' header",
    -5: "allocation failure",
}


def read_and_encode(
    file_name: str, alphabet, dedup: bool = True
) -> Tuple[np.ndarray, List[str]]:
    """Parse + encode + dedup a FASTA file natively.

    Returns an (N, L) int8 array (0-based states, gap = alphabet.gap_state)
    and the ids of the kept records.  Raises on malformed input with the same
    error classes as the Python path.
    """
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native codec unavailable")
    table = alphabet._encode_table.astype(np.int8)
    table_c = table.ctypes.data_as(ctypes.POINTER(ctypes.c_int8))
    data_p = ctypes.POINTER(ctypes.c_int8)()
    n = ctypes.c_int32()
    l = ctypes.c_int32()
    ids_p = ctypes.c_char_p()
    ids_len = ctypes.c_int64()
    rc = lib.fasta_encode(
        file_name.encode(),
        table_c,
        1 if dedup else 0,
        ctypes.byref(data_p),
        ctypes.byref(n),
        ctypes.byref(l),
        ctypes.byref(ids_p),
        ctypes.byref(ids_len),
    )
    if rc != 0:
        from ..io.fasta import FastaError

        raise FastaError(
            f"{_ERRORS.get(rc, f'error {rc}')} in {file_name}"
        )
    try:
        count = int(n.value) * int(l.value)
        data = np.ctypeslib.as_array(data_p, shape=(int(n.value), int(l.value))).copy()
        ids_blob = ctypes.string_at(ids_p, ids_len.value).decode(
            "utf-8", errors="replace"
        )
    finally:
        lib.fasta_free(ctypes.cast(data_p, ctypes.c_void_p))
        lib.fasta_free(ctypes.cast(ids_p, ctypes.c_void_p))
    ids = ids_blob.split("\n") if ids_blob else []
    return data, ids
