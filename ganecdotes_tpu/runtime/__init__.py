"""Native host-side runtime: threaded prefetching data loader.

The compute path of this framework is jax/XLA/Pallas; the runtime *around*
it — feeding image batches to GAN training without stalling the TPU — is
native C++ (src/loader.cpp), bound through ctypes. ``PyDataLoader`` is the
pure-Python fallback with identical semantics for environments without a
C++ toolchain.

Counterpart of the torch DataLoader workers the reference's BagGAN training
relies on (external bagganhq repo; README.md:133-138 points there).
"""

import ctypes
import os
import queue
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "src", "loader.cpp")
_BUILD_DIR = os.path.join(os.path.dirname(__file__), "_build")
_SO = os.path.join(_BUILD_DIR, "libgxloader.so")

_lib = None
_lib_err = None


def _build_library():
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        _SRC, "-o", _SO,
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def load_native():
    """Build (once) and load the native loader library; None if unavailable."""
    global _lib, _lib_err
    if _lib is not None or _lib_err is not None:
        return _lib
    try:
        if not os.path.exists(_SO) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)
        ):
            _build_library()
        lib = ctypes.CDLL(_SO)
        lib.gx_open.restype = ctypes.c_void_p
        lib.gx_open.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_uint, ctypes.c_int, ctypes.c_int,
        ]
        lib.gx_next.restype = ctypes.c_int
        lib.gx_next.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_float)]
        lib.gx_batches.restype = ctypes.c_long
        lib.gx_batches.argtypes = [ctypes.c_void_p]
        lib.gx_errors.restype = ctypes.c_long
        lib.gx_errors.argtypes = [ctypes.c_void_p]
        lib.gx_epoch.restype = ctypes.c_long
        lib.gx_epoch.argtypes = [ctypes.c_void_p]
        lib.gx_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception as e:  # toolchain missing / build failure
        _lib_err = e
        _lib = None
    return _lib


class NativeDataLoader:
    """Endless shuffled (B, H, W, C) float32 batches from .npy image files."""

    def __init__(self, paths, batch, h, w, c, queue_depth=4, n_threads=4,
                 seed=0, shuffle=True, normalize=True):
        lib = load_native()
        if lib is None:
            raise RuntimeError(f"native loader unavailable: {_lib_err}")
        self._lib = lib
        self.batch, self.h, self.w, self.c = batch, h, w, c
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths]
        )
        self._handle = lib.gx_open(
            arr, len(paths), batch, h, w, c, queue_depth, n_threads,
            seed, int(shuffle), int(normalize),
        )
        if not self._handle:
            raise RuntimeError("gx_open failed")
        self._buf = np.empty((batch, h, w, c), dtype=np.float32)

    def next(self):
        rc = self._lib.gx_next(
            self._handle,
            self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise StopIteration
        return self._buf.copy()

    __next__ = next

    def __iter__(self):
        return self

    @property
    def batches_produced(self):
        if not self._handle:
            return self._final_stats[0]
        return int(self._lib.gx_batches(self._handle))

    @property
    def decode_errors(self):
        if not self._handle:
            return self._final_stats[1]
        return int(self._lib.gx_errors(self._handle))

    @property
    def epoch(self):
        if not self._handle:
            return self._final_stats[2]
        return int(self._lib.gx_epoch(self._handle))

    def close(self):
        if self._handle:
            self._final_stats = (
                self.batches_produced, self.decode_errors, self.epoch
            )
            self._lib.gx_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class PyDataLoader:
    """Pure-Python fallback with the same API (threads + bounded queue)."""

    def __init__(self, paths, batch, h, w, c, queue_depth=4, n_threads=2,
                 seed=0, shuffle=True, normalize=True):
        self.paths = list(paths)
        self.batch, self.h, self.w, self.c = batch, h, w, c
        self.normalize = normalize
        self.shuffle = shuffle
        self._rng = np.random.RandomState(seed)
        self._order = list(range(len(self.paths)))
        if shuffle:
            self._rng.shuffle(self._order)
        self._cursor = 0
        self.epoch = 0
        self.decode_errors = 0
        self.batches_produced = 0
        self._q = queue.Queue(maxsize=queue_depth)
        self._stop = threading.Event()
        self._idx_mu = threading.Lock()
        self._threads = [
            threading.Thread(target=self._worker, daemon=True)
            for _ in range(n_threads)
        ]
        for t in self._threads:
            t.start()

    def _claim(self):
        with self._idx_mu:
            ids = []
            for _ in range(self.batch):
                if self._cursor >= len(self._order):
                    self._cursor = 0
                    self.epoch += 1
                    if self.shuffle:
                        self._rng.shuffle(self._order)
                ids.append(self._order[self._cursor])
                self._cursor += 1
            return ids

    def _decode(self, path):
        try:
            a = np.load(path)
            if a.ndim == 2:
                a = a[..., None]
            if a.shape != (self.h, self.w, self.c):
                raise ValueError(a.shape)
            if a.dtype == np.uint8:
                a = (
                    a.astype(np.float32) / 127.5 - 1.0
                    if self.normalize
                    else a.astype(np.float32)
                )
            return a.astype(np.float32)
        except Exception:
            self.decode_errors += 1
            return np.zeros((self.h, self.w, self.c), np.float32)

    def _worker(self):
        while not self._stop.is_set():
            ids = self._claim()
            out = np.stack([self._decode(self.paths[i]) for i in ids])
            while not self._stop.is_set():
                try:
                    self._q.put(out, timeout=0.1)
                    self.batches_produced += 1
                    break
                except queue.Full:
                    continue

    def next(self):
        return self._q.get()

    __next__ = next

    def __iter__(self):
        return self

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass


def make_loader(paths, batch, h, w, c, prefer_native=True, **kw):
    """NativeDataLoader when the toolchain allows, else PyDataLoader."""
    if prefer_native and load_native() is not None:
        return NativeDataLoader(paths, batch, h, w, c, **kw)
    return PyDataLoader(paths, batch, h, w, c, **kw)
