"""ctypes bindings for the C++ async sample sink."""
from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_SRC = Path(__file__).parent / 'sample_sink.cpp'
_LIB = Path(__file__).parent / 'build' / 'libsample_sink.so'
_lock = threading.Lock()
_lib_handle: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib_handle, _build_failed
    with _lock:
        if _lib_handle is not None or _build_failed:
            return _lib_handle
        try:
            if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
                _LIB.parent.mkdir(exist_ok=True)
                subprocess.run(
                    ['g++', '-O2', '-shared', '-fPIC', '-pthread',
                     str(_SRC), '-o', str(_LIB)],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(str(_LIB))
            lib.sink_create.restype = ctypes.c_void_p
            lib.sink_create.argtypes = [ctypes.c_char_p, ctypes.c_long,
                                        ctypes.c_long]
            lib.sink_write.restype = ctypes.c_int
            lib.sink_write.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long]
            lib.sink_rows_written.restype = ctypes.c_long
            lib.sink_rows_written.argtypes = [ctypes.c_void_p]
            lib.sink_flush.restype = ctypes.c_int
            lib.sink_flush.argtypes = [ctypes.c_void_p]
            lib.sink_destroy.argtypes = [ctypes.c_void_p]
            _lib_handle = lib
        except (subprocess.CalledProcessError, OSError) as e:
            logger.warning('native sample sink unavailable (%s); '
                           'falling back to numpy writer', e)
            _build_failed = True
        return _lib_handle


def native_available() -> bool:
    return _load() is not None


class NativeSampleSink:
    """Async chunk writer matching the runtime's ``sample_sink`` protocol.

    Writes each chain's draws to ``chain_{c}/samples.bin`` (raw float32
    rows) + ``samples.meta`` on a background C++ thread. ``close()``
    drains the queue; :func:`mile_tpu.train.checkpoint.load_flat_samples`
    reads the format back.
    """

    def __init__(self, directory: str | Path, n_chains: int, dim: int):
        self.directory = Path(directory)
        self.n_chains = n_chains
        self.dim = dim
        self._lib = _load()
        if self._lib is not None:
            self.directory.mkdir(parents=True, exist_ok=True)
            self._handle = self._lib.sink_create(
                str(self.directory).encode(), n_chains, dim)
        else:  # pure-python fallback: synchronous append
            self._handle = None
            self._files = []
            for c in range(n_chains):
                d = self.directory / f'chain_{c}'
                d.mkdir(parents=True, exist_ok=True)
                (d / 'samples.meta').write_text(
                    f'{{"dim": {dim}, "dtype": "float32"}}\n')
                self._files.append(open(d / 'samples.bin', 'wb'))

    def __call__(self, chunk: np.ndarray, start: int) -> None:
        chunk = np.ascontiguousarray(chunk, dtype=np.float32)
        c, block, dim = chunk.shape
        if self._handle is not None:
            ptr = chunk.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            rc = self._lib.sink_write(self._handle, ptr, c, block, dim, start)
            if rc != 0:
                raise IOError('native sample sink write failed')
        else:
            for i, f in enumerate(self._files[:c]):
                chunk[i].tofile(f)

    @property
    def rows_written(self) -> int:
        if self._handle is not None:
            return int(self._lib.sink_rows_written(self._handle))
        return -1

    def close(self) -> None:
        if self._handle is not None:
            if self._lib.sink_flush(self._handle) != 0:
                raise IOError('native sample sink flush failed')
            self._lib.sink_destroy(self._handle)
            self._handle = None
        else:
            for f in getattr(self, '_files', []):
                f.close()
            self._files = []

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
