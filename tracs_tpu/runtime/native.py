"""ctypes loader for the native C++ host-ingest library.

The reference keeps its hot host loops in C++ (src/pairsnp.hpp loader,
src/kseq.h).  Here the equivalents — gzip FASTA parsing + bit-plane packing
and pileup text parsing — live in src/tracs_native.cpp, compiled to
libtracs_native.so and called through ctypes (no pybind11 in this image).
Every entry point has a numpy fallback so the framework works unbuilt.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB: "ctypes.CDLL | None | bool" = None  # None = not tried, False = unavailable

_SRC_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "src")
_LIB_PATH = os.path.join(_SRC_DIR, "libtracs_native.so")


def _build() -> bool:
    cpp = os.path.join(_SRC_DIR, "tracs_native.cpp")
    if not os.path.exists(cpp):
        return False
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
        "-std=c++17", cpp, "-o", _LIB_PATH, "-lz",
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
        if r.returncode != 0:
            logging.debug("native build failed: %s", r.stderr[-2000:])
            return False
        return True
    except Exception as e:  # pragma: no cover - toolchain missing
        logging.debug("native build failed: %s", e)
        return False


def get_lib():
    """Return the loaded CDLL, building it on first use; None if unavailable."""
    global _LIB
    with _LOCK:
        if _LIB is False:
            return None
        if _LIB is not None:
            return _LIB
        if not os.path.exists(_LIB_PATH):
            src = os.path.join(_SRC_DIR, "tracs_native.cpp")
            if not (os.path.exists(src) and _build()):
                _LIB = False
                return None
        # rebuild if source is newer than the library
        src = os.path.join(_SRC_DIR, "tracs_native.cpp")
        if os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH):
            _build()
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _LIB = False
            return None
        _configure(lib)
        _LIB = lib
        return lib


def _configure(lib) -> None:
    u8p = np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS")
    u32p = np.ctypeslib.ndpointer(dtype=np.uint32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")

    lib.tn_fasta_scan.restype = ctypes.c_int64
    lib.tn_fasta_scan.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64)]

    lib.tn_fasta_pack.restype = ctypes.c_int64
    lib.tn_fasta_pack.argtypes = [
        ctypes.c_char_p, u32p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_char_p, ctypes.c_int64,
    ]

    lib.tn_parse_pileup.restype = ctypes.c_int64
    lib.tn_parse_pileup.argtypes = [
        ctypes.c_char_p, f32p, ctypes.c_int64, i64p, ctypes.c_int64,
        u8p, ctypes.c_int64, ctypes.c_int,
    ]

    u64p = np.ctypeslib.ndpointer(dtype=np.uint64, flags="C_CONTIGUOUS")
    lib.tn_sketch_file.restype = ctypes.c_int64
    lib.tn_sketch_file.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, u64p, ctypes.c_int64,
    ]


def native_pack_fasta(path):
    """Parse + bit-pack an aligned FASTA via the native library.

    Returns a PackedAlignment or None when the native path is unavailable
    (caller falls back to the numpy packer).
    """
    from tracs_tpu.ops.packing import PackedAlignment

    lib = get_lib()
    if lib is None:
        return None
    path_b = os.fspath(path).encode()
    seq_len = ctypes.c_int64(0)
    n = lib.tn_fasta_scan(path_b, ctypes.byref(seq_len))
    if n == -2:
        raise ValueError("Error reading FASTA, variable sequence lengths!")
    if n < 0:
        raise ValueError(f"Error reading FASTA {os.fspath(path)!r}")
    if n == 0:
        raise ValueError(f"No sequences found in {path!r}")
    L = seq_len.value
    W = (L + 31) // 32
    planes = np.zeros((n, 4, W), dtype=np.uint32)
    name_cap = 4096
    names_buf = ctypes.create_string_buffer(n * name_cap)
    rc = lib.tn_fasta_pack(path_b, planes, n, L, names_buf, name_cap)
    if rc < 0:
        raise ValueError(f"Error packing FASTA {path!r} (code {rc})")
    names = [
        names_buf.raw[i * name_cap : (i + 1) * name_cap].split(b"\x00", 1)[0].decode()
        for i in range(n)
    ]
    return PackedAlignment(planes=planes, length=L, names=names)
