"""Python binding for the native prefetching token loader
(native/qtt_dataloader.cc) via ctypes — no pybind11 in this environment.

The reference feeds training through torch DataLoader worker processes;
this is the TPU-side equivalent: C++ worker threads shuffle and assemble
fixed-shape (batch, seq_len + 1) int32 windows into a bounded ring, so the
Python step loop only ever does one memcpy + device put per batch.

Builds the shared library on first use if the checkout is fresh
(``make libqtt_dataloader.so`` in native/).
"""

import ctypes
import os
import subprocess
import weakref
from typing import Iterator, Optional

import numpy as np

__all__ = ["TokenLoader", "write_token_file"]

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB = None


def _lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = os.path.join(_NATIVE_DIR, "libqtt_dataloader.so")
    if not os.path.exists(path):
        subprocess.run(["make", "libqtt_dataloader.so"], cwd=_NATIVE_DIR,
                       check=True, capture_output=True)
    lib = ctypes.CDLL(path)
    lib.qtl_open.restype = ctypes.c_void_p
    lib.qtl_open.argtypes = [ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
                             ctypes.c_ulonglong, ctypes.c_int]
    lib.qtl_num_batches.restype = ctypes.c_long
    lib.qtl_num_batches.argtypes = [ctypes.c_void_p]
    lib.qtl_next.restype = ctypes.c_int
    lib.qtl_next.argtypes = [ctypes.c_void_p,
                             ctypes.POINTER(ctypes.c_int32)]
    lib.qtl_close.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def write_token_file(path: str, tokens: np.ndarray) -> None:
    """Raw little-endian int32 corpus format the loader consumes."""
    np.asarray(tokens, dtype="<i4").tofile(path)


class TokenLoader:
    """Epoch iterator over shuffled (batch, seq_len + 1) int32 windows.

    Every non-overlapping window of the corpus appears exactly once per
    epoch (seeded Fisher-Yates in native code); prefetch depth 8 batches,
    ``n_threads`` C++ workers.
    """

    def __init__(self, path: str, seq_len: int, batch: int, *,
                 seed: int = 0, n_threads: int = 2):
        self._lib = _lib()
        self._h = self._lib.qtl_open(
            path.encode(), seq_len, batch, seed, n_threads)
        if not self._h:
            raise FileNotFoundError(
                f"cannot open token file (or too small): {path}")
        self.seq_len = seq_len
        self.batch = batch
        self.num_batches = int(self._lib.qtl_num_batches(self._h))
        self._buf = np.empty((batch, seq_len + 1), dtype=np.int32)
        # unclosed loaders would leak the C++ worker threads and the whole
        # in-memory corpus; tie cleanup to GC (close() remains idempotent)
        self._finalizer = weakref.finalize(
            self, self._lib.qtl_close, self._h)

    def __len__(self) -> int:
        return self.num_batches

    def epoch(self) -> Iterator[np.ndarray]:
        """Yield every batch of one epoch, then reshuffle."""
        ptr = self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        while True:
            rc = self._lib.qtl_next(self._h, ptr)
            if rc != 0:
                return
            yield self._buf.copy()

    def close(self) -> None:
        if self._h:
            self._finalizer()   # calls qtl_close exactly once
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
