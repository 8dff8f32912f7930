"""Native (C++) runtime components: build + ctypes loading.

The C++ sources live in csrc/; they are compiled on demand with the system
g++ into csrc/build/ and loaded via ctypes (no pybind11 in this image).
Every native path has a pure-Python fallback — absence of a compiler never
breaks the framework.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

log = logging.getLogger("rwkvtts_tpu")

# RWKVTTS_CSRC lets an installed (non-checkout) package point at the C++
# sources; default is the repo-checkout layout (csrc/ beside the package).
_CSRC = os.environ.get(
    "RWKVTTS_CSRC",
    os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..", "csrc")),
)
_BUILD = os.path.join(_CSRC, "build")
_LOCK = threading.Lock()


def _build(name: str, extra_flags=()) -> Optional[str]:
    src = os.path.join(_CSRC, f"{name}.cpp")
    out = os.path.join(_BUILD, f"lib{name}.so")
    if not os.path.exists(src):
        return None
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    os.makedirs(_BUILD, exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", out, src, *extra_flags]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return out
    except Exception as e:  # noqa: BLE001
        log.info("native build of %s failed (%s); using Python fallback", name, e)
        return None


def load(name: str, extra_flags=()) -> Optional[ctypes.CDLL]:
    with _LOCK:
        path = _build(name, extra_flags)
    if path is None:
        return None
    try:
        return ctypes.CDLL(path)
    except OSError:
        return None


class NativeTrieEncoder:
    """ctypes wrapper over csrc/world_tokenizer.cpp."""

    def __init__(self, vocab_items):
        """vocab_items: iterable of (id, bytes)."""
        self._lib = load("world_tokenizer")
        if self._lib is None:
            raise RuntimeError("native tokenizer unavailable")
        self._lib.wt_create.restype = ctypes.c_void_p
        self._lib.wt_create.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        self._lib.wt_encode.restype = ctypes.c_int64
        self._lib.wt_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ]
        self._lib.wt_destroy.argtypes = [ctypes.c_void_p]

        parts = []
        for tid, bs in vocab_items:
            parts.append(
                int(tid).to_bytes(4, "little")
                + len(bs).to_bytes(4, "little")
                + bs
            )
        blob = b"".join(parts)
        self._h = self._lib.wt_create(blob, len(blob))
        if not self._h:
            raise RuntimeError("wt_create failed")

    def encode_bytes(self, src: bytes):
        cap = max(len(src), 16)
        out = (ctypes.c_int32 * cap)()
        n = self._lib.wt_encode(self._h, src, len(src), out, cap)
        if n == -1000000000:
            raise RuntimeError("token buffer overflow")
        if n < 0:
            pos = -int(n) - 1
            raise ValueError(f"unencodable byte {src[pos]:#x} at position {pos}")
        return list(out[: int(n)])

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.wt_destroy(self._h)
        except Exception:
            pass


import atexit as _atexit
import weakref as _weakref

_OPEN_TAR_STREAMS: "_weakref.WeakSet" = _weakref.WeakSet()


@_atexit.register
def _close_tar_streams():
    # join reader threads before interpreter teardown — a C++ thread still
    # parsing while Python unloads is a segfault at exit
    for s in list(_OPEN_TAR_STREAMS):
        try:
            s.close()
        except Exception:  # noqa: BLE001
            pass


class NativeTarStream:
    """ctypes wrapper over csrc/tar_stream.cpp — background-thread tar
    shard reader with a bounded prefetch queue. Iterate to get
    (member_name, bytes) in archive order across all shards."""

    def __init__(self, paths, queue_cap: int = 64):
        self._lib = load("tar_stream", extra_flags=("-pthread",))
        if self._lib is None:
            raise RuntimeError("native tar streamer unavailable")
        self._lib.ts_open.restype = ctypes.c_void_p
        self._lib.ts_open.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32]
        self._lib.ts_next.restype = ctypes.c_int32
        self._lib.ts_next.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
        ]
        self._lib.ts_errors.restype = ctypes.c_int64
        self._lib.ts_errors.argtypes = [ctypes.c_void_p]
        self._lib.ts_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
        self._lib.ts_close.argtypes = [ctypes.c_void_p]
        blob = "\n".join(str(p) for p in paths).encode()
        self._h = self._lib.ts_open(blob, len(blob), queue_cap)
        if not self._h:
            raise RuntimeError("ts_open failed")
        _OPEN_TAR_STREAMS.add(self)

    def __iter__(self):
        """Yields (shard_index, member_name, bytes) — the shard index keys
        sample grouping (identical basenames in different shards must not
        merge)."""
        name_buf = ctypes.create_string_buffer(4096)
        data_p = ctypes.POINTER(ctypes.c_uint8)()
        n = ctypes.c_int64()
        shard = ctypes.c_int32()
        while True:
            rc = self._lib.ts_next(
                self._h, name_buf, len(name_buf), ctypes.byref(data_p),
                ctypes.byref(n), ctypes.byref(shard),
            )
            if rc != 1:
                return
            try:
                data = ctypes.string_at(data_p, n.value)
            finally:
                self._lib.ts_free(data_p)
            yield shard.value, name_buf.value.decode("utf-8", "replace"), data

    @property
    def errors(self) -> int:
        return int(self._lib.ts_errors(self._h))

    def close(self):
        if self._h:
            self._lib.ts_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:  # noqa: BLE001 — interpreter teardown
            pass
