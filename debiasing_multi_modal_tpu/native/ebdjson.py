"""ctypes binding for the native embedding-cache JSON parser (native/ebdjson.cpp).

Builds the shared library on first use (g++, see native/Makefile); falls back
cleanly if no toolchain is available — callers (data/embeddings_store) catch
any exception and use the pure-Python loader.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libebdjson.so")

_lock = threading.Lock()
_lib = None


def _build():
    src = os.path.join(_NATIVE_DIR, "ebdjson.cpp")
    if not os.path.isfile(src):
        raise FileNotFoundError(src)
    subprocess.run(
        ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", src, "-o", _LIB_PATH],
        check=True,
        capture_output=True,
    )


def _load_lib():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.isfile(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(
            os.path.join(_NATIVE_DIR, "ebdjson.cpp")
        ):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        lib.ebd_parse.restype = ctypes.c_void_p
        lib.ebd_parse.argtypes = [ctypes.c_char_p] * 3
        lib.ebd_error.restype = ctypes.c_char_p
        lib.ebd_error.argtypes = [ctypes.c_void_p]
        for name in ("ebd_n", "ebd_dim"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int64
            fn.argtypes = [ctypes.c_void_p]
        lib.ebd_embeddings.restype = ctypes.POINTER(ctypes.c_float)
        lib.ebd_embeddings.argtypes = [ctypes.c_void_p]
        for name in ("ebd_y", "ebd_place", "ebd_group", "ebd_split", "ebd_y_pred"):
            fn = getattr(lib, name)
            fn.restype = ctypes.POINTER(ctypes.c_int32)
            fn.argtypes = [ctypes.c_void_p]
        lib.ebd_filename.restype = ctypes.c_char_p
        lib.ebd_filename.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.ebd_free.argtypes = [ctypes.c_void_p]
        lib.ebd_write.restype = ctypes.c_int
        lib.ebd_write.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64,
        ]
        _lib = lib
        return lib


def load_embeddings_json(path: str, dataset: str):
    """Parse a clip.json cache into an EmbeddingTable via the C++ parser."""
    from debiasing_multi_modal_tpu.data.embeddings_store import (
        _JSON_KEYS,  # ONE schema table — a private copy here diverged once
        EmbeddingTable,
    )

    ykey, pkey = _JSON_KEYS[dataset]
    lib = _load_lib()
    handle = lib.ebd_parse(
        path.encode(), ykey.encode(), pkey.encode()
    )
    if not handle:
        # allocation failed even for the error Table (native OOM guard)
        raise MemoryError("ebdjson: native parser out of memory")
    try:
        err = lib.ebd_error(handle)
        if err:
            raise ValueError(f"ebdjson: {err.decode()}")
        n = lib.ebd_n(handle)
        d = lib.ebd_dim(handle)

        def as_np(ptr, shape, dtype):
            # an empty std::vector's data() is NULL — as_array would raise
            # on a perfectly valid empty table
            if n == 0 or not ptr:
                return np.zeros(shape, dtype)
            return np.ctypeslib.as_array(ptr, shape=shape).astype(dtype, copy=True)

        emb = as_np(lib.ebd_embeddings(handle), (n, d), np.float32)

        def col(fn):
            return as_np(fn(handle), (n,), np.int32)

        filenames = np.asarray(
            [lib.ebd_filename(handle, i).decode() for i in range(n)]
        )
        return EmbeddingTable(
            filenames=filenames,
            y=col(lib.ebd_y),
            place=col(lib.ebd_place),
            group=col(lib.ebd_group),
            split=col(lib.ebd_split),
            y_pred=col(lib.ebd_y_pred),
            embeddings=emb,
        )
    finally:
        lib.ebd_free(handle)


def save_embeddings_json(path: str, table, dataset: str) -> None:
    """Serialize an EmbeddingTable into the reference clip.json schema via
    the C++ writer."""
    from debiasing_multi_modal_tpu.data.embeddings_store import _JSON_KEYS

    ykey, pkey = _JSON_KEYS[dataset]
    lib = _load_lib()

    def col(a):
        arr = np.ascontiguousarray(a, np.int32)
        return arr, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    names = b"\0".join(str(fn).encode() for fn in table.filenames) + b"\0"
    emb = np.ascontiguousarray(table.embeddings, np.float32)
    keep = [col(table.y), col(table.place), col(table.group), col(table.split),
            col(table.y_pred)]
    rc = lib.ebd_write(
        path.encode(), ykey.encode(), pkey.encode(), names,
        keep[0][1], keep[1][1], keep[2][1], keep[3][1], keep[4][1],
        emb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(table), emb.shape[1] if emb.ndim == 2 else 0,
    )
    if rc != 0:
        raise IOError(f"ebdjson writer failed (rc={rc}) for {path!r}")
