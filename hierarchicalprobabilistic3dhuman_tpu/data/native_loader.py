"""Python bindings for the native C++ batch sampler (GIL-free batch assembly).

The sampler memory-maps fixed-record binary tensor stores (one per field,
e.g. poses / textures / pre-resized backgrounds), assembles shuffled batches
on C++ worker threads, and hands them to Python as numpy arrays — host input
work overlaps TPU compute without DataLoader worker processes.

The shared library is compiled on first use with g++ (cached next to the
source); see native/batch_sampler.cpp for the C ABI.
"""

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SRC = os.path.join(_NATIVE_DIR, "batch_sampler.cpp")
_SO = os.path.join(_NATIVE_DIR, "libbatch_sampler.so")

_lib = None


def _load_library():
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             _SRC, "-o", _SO],
            check=True)
    lib = ctypes.CDLL(_SO)
    lib.bs_create.restype = ctypes.c_void_p
    lib.bs_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int,
                              ctypes.c_uint64, ctypes.c_int]
    lib.bs_add_store.restype = ctypes.c_int
    lib.bs_add_store.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                 ctypes.c_int64, ctypes.c_int64]
    lib.bs_start.restype = ctypes.c_int
    lib.bs_start.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.bs_batch_bytes.restype = ctypes.c_int64
    lib.bs_batch_bytes.argtypes = [ctypes.c_void_p]
    lib.bs_next.restype = ctypes.c_int
    lib.bs_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8)]
    lib.bs_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def write_tensor_store(path, array):
    """Write a (N, ...) array as a fixed-record binary store + .meta sidecar."""
    array = np.ascontiguousarray(array)
    array.tofile(path)
    np.save(path + ".meta.npy",
            {"shape": array.shape, "dtype": str(array.dtype)},
            allow_pickle=True)
    return path


def read_store_meta(path):
    meta = np.load(path + ".meta.npy", allow_pickle=True).item()
    return tuple(meta["shape"]), np.dtype(meta["dtype"])


class NativeBatchSampler:
    """Infinite iterator over shuffled batches from one or more stores.

    :param store_paths: list of paths written by write_tensor_store; all must
        have the same leading (record) dimension.
    :param batch_size: records per batch.
    """

    def __init__(self, store_paths, batch_size, n_threads=2, capacity=4,
                 seed=0, shuffle=True):
        lib = _load_library()
        self._lib = lib
        self.batch_size = batch_size
        self._handle = lib.bs_create(batch_size, n_threads, capacity, seed,
                                     1 if shuffle else 0)
        self._fields = []
        n_items = None
        for path in store_paths:
            shape, dtype = read_store_meta(path)
            if n_items is None:
                n_items = shape[0]
            assert shape[0] == n_items, "stores must share the record dim"
            item_bytes = int(np.prod(shape[1:])) * dtype.itemsize
            rc = lib.bs_add_store(self._handle, path.encode(), item_bytes,
                                  shape[0])
            if rc != 0:
                raise OSError(f"bs_add_store({path}) failed with {rc}")
            self._fields.append((shape[1:], dtype, item_bytes))
        rc = lib.bs_start(self._handle, n_threads)
        if rc != 0:
            raise RuntimeError(f"bs_start failed with {rc}")
        self.n_items = n_items
        self._batch_bytes = lib.bs_batch_bytes(self._handle)

    def next(self):
        """:return: list of (batch_size, ...) arrays, one per store."""
        buf = np.empty(self._batch_bytes, np.uint8)
        rc = self._lib.bs_next(self._handle,
                               buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if rc != 0:
            raise RuntimeError("bs_next failed")
        out = []
        offset = 0
        for shape, dtype, item_bytes in self._fields:
            nbytes = item_bytes * self.batch_size
            field = buf[offset:offset + nbytes].view(dtype)
            out.append(field.reshape((self.batch_size,) + tuple(shape)))
            offset += nbytes
        return out

    def __iter__(self):
        while True:
            yield self.next()

    def close(self):
        if self._handle is not None:
            self._lib.bs_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeTrainLoader:
    """Epoch-shaped dict-batch view over a NativeBatchSampler, drop-in for
    the Python threaded DataLoader in the training loop (reference
    equivalent: torch DataLoader workers, train driver :43-56 — here batch
    assembly is mmap+memcpy on C++ threads, zero worker processes).

    :param store_dir: directory with poses.bin / textures.bin /
        backgrounds.bin written by data.pack_training_stores.
    """

    KEYS = ("pose", "texture", "background")

    def __init__(self, store_dir, batch_size, n_threads=2, seed=0):
        paths = [os.path.join(store_dir, f) for f in
                 ("poses.bin", "textures.bin", "backgrounds.bin")]
        for p in paths:
            if not os.path.exists(p):
                raise FileNotFoundError(p)
        self._sampler = NativeBatchSampler(paths, batch_size,
                                           n_threads=n_threads, seed=seed)
        self.batch_size = batch_size
        self.steps_per_epoch = max(self._sampler.n_items // batch_size, 1)

    def __len__(self):
        return self.steps_per_epoch

    def __iter__(self):
        for _ in range(self.steps_per_epoch):
            pose, texture, background = self._sampler.next()
            yield {"pose": pose, "texture": texture,
                   "background": background}

    def close(self):
        self._sampler.close()
