"""ctypes bindings for the native host data pipeline (native/dataio.cc).

Auto-builds libursa_dataio.so with `make` on first use; every entry point
has a pure-numpy fallback so the framework never hard-depends on the
toolchain. The native path backs ``HostStreamingSplit`` — the loader for
datasets too large to keep device-resident (ImageNet-scale), with
double-buffered host->device prefetch replacing torch DataLoader workers.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libursa_dataio.so"))
_lib = None
_lib_tried = False


_DATAIO_VERSION = 3


def _load_lib():
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    try:
        # `make` is a no-op when the .so is newer than dataio.cc, and
        # rebuilds a stale (older-version) library in place. Best-effort:
        # a prebuilt current .so must still load on machines without a
        # toolchain (the version assert below catches a stale binary).
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True, capture_output=True,
        )
    except Exception:
        pass
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.ursa_permutation.argtypes = [
            ctypes.c_int64, ctypes.c_uint64, ctypes.POINTER(ctypes.c_int64)
        ]
        lib.ursa_gather_normalize.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.ursa_gather_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.ursa_stream_create.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_uint64, ctypes.c_int32, ctypes.c_int32,
        ]
        lib.ursa_stream_create.restype = ctypes.c_void_p
        lib.ursa_stream_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.ursa_stream_next.restype = ctypes.c_int64
        lib.ursa_stream_create_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_uint64, ctypes.c_int32, ctypes.c_int32,
        ]
        lib.ursa_stream_create_u8.restype = ctypes.c_void_p
        lib.ursa_stream_next_u8.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.ursa_stream_next_u8.restype = ctypes.c_int64
        lib.ursa_stream_num_batches.argtypes = [ctypes.c_void_p]
        lib.ursa_stream_num_batches.restype = ctypes.c_int64
        lib.ursa_stream_destroy.argtypes = [ctypes.c_void_p]
        lib.ursa_dataio_version.restype = ctypes.c_int32
        assert lib.ursa_dataio_version() == _DATAIO_VERSION
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load_lib() is not None


def _ptr(a: np.ndarray, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def permutation(n: int, seed: int) -> np.ndarray:
    lib = _load_lib()
    if lib is None:
        return np.random.default_rng(seed).permutation(n).astype(np.int64)
    out = np.empty(n, np.int64)
    lib.ursa_permutation(n, seed, _ptr(out, ctypes.c_int64))
    return out


def gather_normalize(
    images: np.ndarray, labels: np.ndarray, indices: np.ndarray,
    mean: np.ndarray, std: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """(batch, H, W, C) float32 normalized + (batch,) int32 labels."""
    n, h, w, c = images.shape
    b = indices.shape[0]
    lib = _load_lib()
    if lib is None:
        x = (images[indices].astype(np.float32) / 255.0 - mean) / std
        return x, labels[indices].astype(np.int32)
    images = np.ascontiguousarray(images)
    labels64 = np.ascontiguousarray(labels, np.int64)
    idx = np.ascontiguousarray(indices, np.int64)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    out_x = np.empty((b, h, w, c), np.float32)
    out_y = np.empty(b, np.int32)
    lib.ursa_gather_normalize(
        _ptr(images, ctypes.c_uint8), _ptr(labels64, ctypes.c_int64),
        h * w, c, _ptr(idx, ctypes.c_int64), b,
        _ptr(mean, ctypes.c_float), _ptr(std, ctypes.c_float),
        _ptr(out_x, ctypes.c_float), _ptr(out_y, ctypes.c_int32),
    )
    return out_x, out_y


def gather_u8(
    images: np.ndarray, labels: np.ndarray, indices: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    n = images.shape[0]
    b = indices.shape[0]
    lib = _load_lib()
    if lib is None:
        return images[indices], labels[indices].astype(np.int32)
    images = np.ascontiguousarray(images)
    labels64 = np.ascontiguousarray(labels, np.int64)
    idx = np.ascontiguousarray(indices, np.int64)
    item = int(np.prod(images.shape[1:]))
    out_x = np.empty((b,) + images.shape[1:], np.uint8)
    out_y = np.empty(b, np.int32)
    lib.ursa_gather_u8(
        _ptr(images, ctypes.c_uint8), _ptr(labels64, ctypes.c_int64), item,
        _ptr(idx, ctypes.c_int64), b, _ptr(out_x, ctypes.c_uint8),
        _ptr(out_y, ctypes.c_int32),
    )
    return out_x, out_y


class HostStreamingSplit:
    """Shuffled epoch iterator over a host-resident dataset with
    double-buffered device transfer — the streaming alternative to
    DataSplit's fully device-resident layout.

    ``images`` may be a read-only ``np.load(..., mmap_mode='r')`` memmap:
    the C++ gather reads straight from the mapped pages (no RAM copy of
    the dataset), so beyond-RAM datasets stream from disk through the
    same pipeline — and on remote-TPU tunnels file-backed pages dodge the
    slow anonymous-fault path entirely (CLAUDE.md allocator landmine).

    ``transfer_dtype='uint8'`` (default) ships RAW uint8 batches and lets
    the training step normalize on device — 4x fewer host->device bytes
    (the streamed path's bottleneck on any transport: PCIe, DCN, or a
    remote tunnel) and bit-identical to the in-HBM epoch's on-device
    ``normalize()``. ``'float32'`` keeps the fused C++ gather+normalize
    (host does the affine; the step sees ready batches)."""

    def __init__(self, images: np.ndarray, labels: np.ndarray, batch_size: int,
                 spec, shuffle: bool = True, seed: int = 0,
                 transfer_dtype: str = "uint8"):
        assert transfer_dtype in ("uint8", "float32"), transfer_dtype
        self.images = images
        self.labels = labels
        self.batch_size = batch_size
        self.spec = spec
        self.shuffle = shuffle
        self.seed = seed
        self.transfer_dtype = transfer_dtype
        self._epoch = 0

    @property
    def n(self) -> int:
        return self.images.shape[0]

    @property
    def num_batches(self) -> int:
        return self.n // self.batch_size

    def epoch(self, sharding=None) -> Iterator:
        """Yield (x, y) device batches for one shuffled epoch. With a
        ``sharding`` (e.g. NamedSharding over the mesh 'data' axis) every
        batch is device_put straight into that layout — the streamed
        multi-chip path (engine.make_sharded_streaming_step_fn)."""
        import jax

        mean = np.asarray(self.spec.mean, np.float32)
        std = np.asarray(self.spec.std, np.float32)
        epoch_seed = self.seed + self._epoch
        self._epoch += 1
        bsz = self.batch_size
        nb = self.num_batches
        if nb == 0:
            return
        u8 = self.transfer_dtype == "uint8"
        lib = _load_lib()
        # native contract (dataio.cc ursa_stream_create): <=16 channels
        # (float32 mode only — uint8 mode has no host affine), n >= batch;
        # anything else uses the numpy gather path
        if lib is not None and self.n >= bsz and (
                u8 or self.images.shape[3] <= 16):
            yield from self._native_epoch(jax, lib, mean, std, epoch_seed,
                                          sharding, u8)
            return
        # numpy fallback: gather on the consumer thread, rely on async
        # device dispatch for (partial) overlap
        if self.shuffle:
            order = permutation(self.n, epoch_seed)
        else:
            order = np.arange(self.n, dtype=np.int64)

        def host_batch(i):
            idx = order[i * bsz: (i + 1) * bsz]
            if u8:
                x, y = gather_u8(self.images, self.labels, idx)
            else:
                x, y = gather_normalize(self.images, self.labels, idx,
                                        mean, std)
            return jax.device_put(x, sharding), jax.device_put(y, sharding)

        nxt = host_batch(0)
        for i in range(nb):
            cur = nxt
            if i + 1 < nb:
                nxt = host_batch(i + 1)
            yield cur

    def _native_epoch(self, jax, lib, mean, std, epoch_seed, sharding=None,
                      u8=False):
        """True background prefetch: the C++ worker thread gathers batch
        i+1..i+depth while Python dispatches batch i to the device (the
        blocking ursa_stream_next call releases the GIL)."""
        images = self.images
        if not (isinstance(images, np.ndarray) and images.flags["C_CONTIGUOUS"]
                and images.dtype == np.uint8):
            images = np.ascontiguousarray(images, np.uint8)
        labels = np.ascontiguousarray(self.labels, np.int64)
        mean = np.ascontiguousarray(mean, np.float32)
        std = np.ascontiguousarray(std, np.float32)
        n, h, w, c = images.shape
        seed = epoch_seed & (2 ** 64 - 1)
        shuf = 1 if self.shuffle else 0
        if u8:
            handle = lib.ursa_stream_create_u8(
                _ptr(images, ctypes.c_uint8), _ptr(labels, ctypes.c_int64),
                n, h * w * c, self.batch_size, seed, shuf, 2,
            )
        else:
            handle = lib.ursa_stream_create(
                _ptr(images, ctypes.c_uint8), _ptr(labels, ctypes.c_int64),
                n, h * w, c, self.batch_size,
                _ptr(mean, ctypes.c_float), _ptr(std, ctypes.c_float),
                seed, shuf, 2,
            )
        if not handle:  # contract pre-checked in epoch(); this is a real bug
            raise RuntimeError("ursa_stream_create failed")
        try:
            out_x = np.empty((self.batch_size, h, w, c),
                             np.uint8 if u8 else np.float32)
            out_y = np.empty(self.batch_size, np.int32)
            nxt = (lib.ursa_stream_next_u8 if u8 else lib.ursa_stream_next)
            xptr = _ptr(out_x, ctypes.c_uint8 if u8 else ctypes.c_float)
            while True:
                bi = nxt(handle, xptr, _ptr(out_y, ctypes.c_int32))
                if bi < 0:
                    return
                # copy before device_put: the stream reuses these buffers
                # for the next batch and device_put may defer its read
                yield (jax.device_put(out_x.copy(), sharding),
                       jax.device_put(out_y.copy(), sharding))
        finally:
            lib.ursa_stream_destroy(handle)
