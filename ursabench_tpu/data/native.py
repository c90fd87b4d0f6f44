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


_DATAIO_VERSION = 4


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
        lib.ursa_stream_reset.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int32
        ]
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
    out_x: np.ndarray = None, out_y: np.ndarray = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """(batch, H, W, C) float32 normalized + (batch,) int32 labels.
    Pass ``out_x``/``out_y`` to reuse (warm) buffers — fresh per-call
    allocations pay the slow anonymous-fault path (_StagingRing doc)."""
    n, h, w, c = images.shape
    b = indices.shape[0]
    lib = _load_lib()
    if lib is None or c > 16:  # >16 channels: outside the C ABI's affine LUT
        if out_x is not None:
            np.subtract(images[indices], 0, out=out_x, casting="unsafe")
            out_x /= 255.0
            out_x -= mean
            out_x /= std
            y = labels[indices].astype(np.int32)
            if out_y is not None:
                out_y[:] = y
                y = out_y
            return out_x, y
        x = (images[indices].astype(np.float32) / 255.0 - mean) / std
        return x, labels[indices].astype(np.int32)
    images = np.ascontiguousarray(images)
    labels64 = np.ascontiguousarray(labels, np.int64)
    idx = np.ascontiguousarray(indices, np.int64)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    if out_x is None:
        out_x = np.empty((b, h, w, c), np.float32)
    if out_y is None:
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


_RING_DEPTH = 2  # overlaps the C++ worker's gather with the consumer's put
_BACKLOG_BYTES = 256_000_000  # max un-fenced upload backlog (reuse mode)


class _StagingRing:
    """Persistent ring of host staging buffers for the stream->device hop.

    With the TPU PJRT plugin loaded, anonymous first-touch page faults run
    ~170x slower (~25 MB/s) than warm pages — a fresh ``np.empty``/``.copy()``
    per batch was the streamed path's actual bottleneck at ImageNet shapes
    (19 MB/batch => ~0.9 s/batch of pure fault cost; the r4 2.6%-MFU
    finding). The ring allocates ``depth`` slots ONCE and reuses them
    forever: the only fault cost is the first lap.

    Slot-reuse safety needs NO per-batch sync in reuse mode: the put-mode
    probe (HostStreamingSplit._probe_put_mode) verifies the backend
    CAPTURES the host bytes before ``device_put`` returns (a multi-MB
    deferred read cannot win the probe's ~µs mutate race), so overwriting
    a slot after its put returned is safe. ALIASING backends (CPU
    zero-copies aligned numpy buffers — the yielded Array IS the slot)
    probe as 'copy' and get a fresh copy per batch instead.

    What reuse mode DOES need is bounded backpressure: the tunnel's put
    captures into an internal staging copy and uploads asynchronously, so
    an unfenced loop queues uploads without bound (memory growth on long
    epochs). Earlier designs paid per-batch syncs and collapsed to half
    the wire rate or worse — measured on-chip: put+step with NO sync runs
    at 42.5 MB/s (the put+sum ceiling, training fully overlapped), a
    per-batch fence fetch drags it to 22.9, block_until_ready to ~10.
    The strided fence keeps the wire rate while bounding the upload
    backlog to ~2 strides (~2x _BACKLOG_BYTES)."""

    def __init__(self, x_shape, x_dtype, y_len, depth=_RING_DEPTH):
        self.x = [np.empty(x_shape, x_dtype) for _ in range(depth)]
        self.y = [np.empty(y_len, np.int32) for _ in range(depth)]
        self.depth = depth
        self._i = 0
        self._fence_fn = None
        self._pending = []
        slot_bytes = int(np.prod(x_shape)) * np.dtype(x_dtype).itemsize
        self._fence_stride = max(1, min(16, _BACKLOG_BYTES // max(slot_bytes,
                                                                  1)))
        self._commits = 0

    def acquire(self):
        """Return the next slot index to fill."""
        i = self._i % self.depth
        self._i += 1
        return i

    def commit(self, i, xd, yd):
        """Strided backpressure (reuse mode): every stride-th transfer
        contributes a one-scalar fence; at most one fence stays
        outstanding, so the upload backlog is bounded without a per-batch
        device->host round trip."""
        del i, yd  # y transfers are ~KB, FIFO behind x: x fences suffice
        self._commits += 1
        if self._commits % self._fence_stride:
            return
        if self._fence_fn is None:
            import jax
            import jax.numpy as jnp

            self._fence_fn = jax.jit(
                lambda x: x.reshape(-1)[0].astype(jnp.int32))
        self._pending.append(self._fence_fn(xd))
        if len(self._pending) > 1:
            np.asarray(self._pending.pop(0))

    def drain(self):
        """Fetch all outstanding fences (epoch end)."""
        for p in self._pending:
            np.asarray(p)
        self._pending = []


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
    (host does the affine; the step sees ready batches).

    ``chunk_batches=M > 1`` stages M batches per transfer: ``epoch()``
    yields ``(x, y)`` of shape ``(M, batch, ...)`` and the engine scans the
    M training steps in ONE device program (stage-to-HBM streaming) — the
    per-step dispatch/transfer overhead amortizes M-fold, for datasets that
    exceed HBM but whose chunks don't. All host buffers (the C++ prefetch
    ring via ``ursa_stream_reset`` and the staging ring here) are allocated
    once per split and reused across epochs."""

    def __init__(self, images: np.ndarray, labels: np.ndarray, batch_size: int,
                 spec, shuffle: bool = True, seed: int = 0,
                 transfer_dtype: str = "uint8", chunk_batches: int = 1,
                 stage_depth: int = _RING_DEPTH):
        assert transfer_dtype in ("uint8", "float32"), transfer_dtype
        assert chunk_batches >= 1, chunk_batches
        assert stage_depth >= 1, stage_depth
        self.images = images
        self.labels = labels
        self.batch_size = batch_size
        self.spec = spec
        self.shuffle = shuffle
        self.seed = seed
        self.transfer_dtype = transfer_dtype
        self.chunk_batches = chunk_batches
        self.stage_depth = stage_depth
        self._epoch = 0
        self._ring = None
        self._put_mode = None  # decided by _probe_put_mode on first put
        self._handle = None
        self._handle_refs = None  # keeps the arrays the C++ stream points at

    @property
    def n(self) -> int:
        return self.images.shape[0]

    @property
    def num_chunks(self) -> int:
        return self.n // (self.batch_size * self.chunk_batches)

    @property
    def num_batches(self) -> int:
        # chunk mode drops the ragged tail at chunk granularity (mirrors
        # batch mode dropping n % batch_size)
        return self.num_chunks * self.chunk_batches

    def __del__(self):
        handle, self._handle = self._handle, None
        if handle is not None:
            try:
                _lib.ursa_stream_destroy(handle)
            except Exception:
                pass  # interpreter shutdown: module globals may be gone

    def _rows_per_transfer(self) -> int:
        return self.batch_size * self.chunk_batches

    def _yield_shapes(self):
        """(x_shape, y_shape) as yielded to the consumer."""
        item = tuple(self.images.shape[1:])
        if self.chunk_batches > 1:
            return ((self.chunk_batches, self.batch_size) + item,
                    (self.chunk_batches, self.batch_size))
        return ((self.batch_size,) + item, (self.batch_size,))

    def _probe_put_mode(self, jax, x, sharding):
        """Detect ALIASING device_put backends ONCE per split: put the
        (real, about-to-be-yielded) staged buffer, flip one byte, fetch
        that element back, restore the byte. An aliasing backend (the CPU
        test backend zero-copies aligned numpy buffers: the returned Array
        IS the slot) deterministically reads the mutated byte — slot reuse
        would corrupt yielded batches, so every batch gets a fresh copy. A
        non-aliasing backend took (or will take) its own copy of the
        original bytes — slots are reused with the overwrite fence
        (_StagingRing.acquire) guaranteeing the copy completed, which
        also makes a deferred-async copy racing this probe harmless: the
        worst misread direction (async copy lands after the mutation,
        reads mutated byte) selects 'copy' — safe, just slower. Returns
        (mode, xd_or_None).

        The CPU platform short-circuits to 'copy' WITHOUT probing:
        zero-copy aliasing is per-buffer alignment-dependent there, so a
        clean probe on slot 0 does not certify the other slots (observed:
        slot-0 copied, slot-1 aliased, corrupted chunk contents). Aliasing
        requires device memory == host memory, i.e. only the cpu platform;
        every other backend owns its device memory and the probe is just a
        guard against exotic semantics."""
        if sharding is not None:
            platform = next(iter(sharding.device_set)).platform
        else:
            platform = jax.devices()[0].platform
        if platform == "cpu":
            return "copy", None
        flat = x.reshape(-1)
        orig = flat[:1].copy()
        xd = jax.device_put(x, sharding)
        flat[0] = (orig[0] ^ 1) if flat.dtype.kind in "iu" else orig[0] + 1.0
        seen = np.asarray(xd.reshape(-1)[0])
        flat[0] = orig[0]
        if seen == orig[0]:
            return "reuse", xd
        return "copy", None

    def _stage_and_put(self, jax, ring, i, sharding):
        """device_put slot i (reshaped to the chunked view when M>1).

        The put mode comes from a one-time behavioral probe
        (``_probe_put_mode``): 'reuse' backends ship the staging slot
        directly — zero per-batch allocation (the r4 2.6%-MFU finding was
        fresh-copy anonymous-fault cost: ~0.9 s/batch at ImageNet shapes)
        — with the ring's fetch-fence guarding overwrite; 'copy' backends
        (CPU zero-copy aliasing) get a fresh copy per batch (CPU streaming
        is the test backend; throughput doesn't matter)."""
        xs, ys = self._yield_shapes()
        x, y = ring.x[i].reshape(xs), ring.y[i].reshape(ys)
        if self._put_mode is None:
            self._put_mode, xd = self._probe_put_mode(jax, x, sharding)
            if self._put_mode == "reuse" and xd is not None:
                yd = jax.device_put(y, sharding)
                ring.commit(i, xd, yd)
                return xd, yd
        if self._put_mode == "copy":
            x, y = x.copy(), y.copy()
        xd = jax.device_put(x, sharding)
        yd = jax.device_put(y, sharding)
        if self._put_mode == "reuse":
            ring.commit(i, xd, yd)
        return xd, yd

    def epoch(self, sharding=None) -> Iterator:
        """Yield (x, y) device batches for one shuffled epoch. With a
        ``sharding`` (e.g. NamedSharding over the mesh 'data' axis) every
        batch is device_put straight into that layout — the streamed
        multi-chip path (engine.make_sharded_streaming_step_fn). In chunk
        mode pass a sharding whose batch axis is axis 1 (P(None, 'data'))."""
        import jax

        mean = np.asarray(self.spec.mean, np.float32)
        std = np.asarray(self.spec.std, np.float32)
        epoch_seed = self.seed + self._epoch
        self._epoch += 1
        rows = self._rows_per_transfer()
        nt = self.n // rows  # transfers this epoch (batches or chunks)
        if nt == 0:
            return
        u8 = self.transfer_dtype == "uint8"
        if self._ring is None:
            item = int(np.prod(self.images.shape[1:]))
            self._ring = _StagingRing(
                (rows, item), np.uint8 if u8 else np.float32, rows,
                depth=self.stage_depth)
        lib = _load_lib()
        # native contract (dataio.cc ursa_stream_create): <=16 channels
        # (float32 mode only — uint8 mode has no host affine), n >= batch;
        # anything else uses the numpy gather path
        if lib is not None and self.n >= rows and (
                u8 or self.images.shape[3] <= 16):
            yield from self._native_epoch(jax, lib, mean, std, epoch_seed,
                                          sharding, u8)
            return
        # numpy fallback: gather on the consumer thread into the staging
        # ring (no fresh allocations), rely on async device dispatch for
        # (partial) overlap
        if self.shuffle:
            order = permutation(self.n, epoch_seed)
        else:
            order = np.arange(self.n, dtype=np.int64)
        ring = self._ring
        flat = self.images.reshape(self.n, -1)

        def host_batch(t):
            idx = order[t * rows: (t + 1) * rows]
            i = ring.acquire()
            if u8:
                np.take(flat, idx, axis=0, out=ring.x[i])
                ring.y[i][:] = self.labels[idx]
            else:
                x = ring.x[i].reshape((rows,) + self.images.shape[1:])
                gather_normalize(self.images, self.labels, idx, mean, std,
                                 out_x=x, out_y=ring.y[i])
            return self._stage_and_put(jax, ring, i, sharding)

        nxt = host_batch(0)
        for t in range(nt):
            cur = nxt
            if t + 1 < nt:
                nxt = host_batch(t + 1)
            yield cur
        ring.drain()

    def _ensure_stream(self, lib, mean, std, epoch_seed, u8):
        """Create the C++ prefetch stream once; later epochs REUSE it via
        ursa_stream_reset so the multi-MB internal ring buffers (and their
        faulted pages) persist — create/destroy per epoch re-pays the
        anonymous first-touch cost every epoch."""
        seed = epoch_seed & (2 ** 64 - 1)
        shuf = 1 if self.shuffle else 0
        if self._handle is not None:
            lib.ursa_stream_reset(self._handle, seed, shuf)
            return self._handle
        images = self.images
        if not (isinstance(images, np.ndarray) and images.flags["C_CONTIGUOUS"]
                and images.dtype == np.uint8):
            images = np.ascontiguousarray(images, np.uint8)
        labels = np.ascontiguousarray(self.labels, np.int64)
        mean = np.ascontiguousarray(mean, np.float32)
        std = np.ascontiguousarray(std, np.float32)
        n, h, w, c = images.shape
        rows = self._rows_per_transfer()
        if u8:
            handle = lib.ursa_stream_create_u8(
                _ptr(images, ctypes.c_uint8), _ptr(labels, ctypes.c_int64),
                n, h * w * c, rows, seed, shuf, 2,
            )
        else:
            handle = lib.ursa_stream_create(
                _ptr(images, ctypes.c_uint8), _ptr(labels, ctypes.c_int64),
                n, h * w, c, rows,
                _ptr(mean, ctypes.c_float), _ptr(std, ctypes.c_float),
                seed, shuf, 2,
            )
        if not handle:  # contract pre-checked in epoch(); this is a real bug
            raise RuntimeError("ursa_stream_create failed")
        self._handle = handle
        # the stream reads these arrays for its whole lifetime
        self._handle_refs = (images, labels, mean, std)
        return handle

    def _native_epoch(self, jax, lib, mean, std, epoch_seed, sharding=None,
                      u8=False):
        """True background prefetch: the C++ worker thread gathers batch
        i+1..i+depth while Python dispatches batch i to the device (the
        blocking ursa_stream_next call releases the GIL). The C++ slot is
        memcpy'd straight into a staging-ring slot (warm pages) that
        device_put reads — no per-batch allocation anywhere on the path."""
        handle = self._ensure_stream(lib, mean, std, epoch_seed, u8)
        ring = self._ring
        nxt = (lib.ursa_stream_next_u8 if u8 else lib.ursa_stream_next)
        ct = ctypes.c_uint8 if u8 else ctypes.c_float
        while True:
            i = ring.acquire()
            bi = nxt(handle, _ptr(ring.x[i], ct),
                     _ptr(ring.y[i], ctypes.c_int32))
            if bi < 0:
                ring.drain()
                return
            yield self._stage_and_put(jax, ring, i, sharding)
