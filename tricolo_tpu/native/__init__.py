"""ctypes bindings for the C++ host-side data-loading runtime.

`native/tricolo_native.cpp` fuses the split-load hot path (npz member
inflate + dense-RGBA→packed-sparse sweep) that the reference performs in
Python per model (general_dataset.py:38-51). The library is optional: every
entry point has a numpy fallback (datasets.dense_rgba_to_packed), and
`ensure_built()` compiles it on demand with the in-image toolchain
(g++ + zlib; no pip).

ABI is versioned — a stale .so is rebuilt automatically.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_ABI_VERSION = 8
_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO_ROOT = os.path.dirname(os.path.dirname(_HERE))
_SRC_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_SRC_DIR, "libtricolo_native.so")

_lib: ctypes.CDLL | None = None
_tried = False


def _bind(lib: ctypes.CDLL):
    lib.tricolo_native_abi_version.restype = ctypes.c_int32
    lib.tricolo_dense_rgba_to_packed.restype = ctypes.c_int64
    lib.tricolo_dense_rgba_to_packed.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
    ]
    lib.tricolo_npz_read.restype = ctypes.c_int64
    lib.tricolo_npz_read.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_char_p, ctypes.c_int32,
    ]
    lib.tricolo_load_npz_voxels_packed.restype = ctypes.c_int64
    lib.tricolo_load_npz_voxels_packed.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
    ]
    lib.tricolo_gzip_decode.restype = ctypes.c_int64
    lib.tricolo_gzip_decode.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
    ]
    lib.tricolo_packed_to_dense.restype = None
    lib.tricolo_packed_to_dense.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_void_p,
    ]
    lib.tricolo_packed_to_windowed.restype = None
    lib.tricolo_packed_to_windowed.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
        ctypes.c_void_p,
    ]
    lib.tricolo_packed_to_windowed_compact.restype = None
    lib.tricolo_packed_to_windowed_compact.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]


def ensure_built(force: bool = False) -> bool:
    """Compile the library if missing or ABI-stale; returns availability."""
    global _lib, _tried
    if _lib is not None and not force:
        return True
    needs_build = force or not os.path.exists(_LIB_PATH)
    if not needs_build:
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            _bind(lib)
            if lib.tricolo_native_abi_version() == _ABI_VERSION:
                _lib = lib
                return True
            needs_build = True
        except (OSError, AttributeError):  # missing lib or missing symbol
            needs_build = True
    try:
        subprocess.run(
            ["make", "-C", _SRC_DIR, "-s"], check=True, capture_output=True
        )
        lib = ctypes.CDLL(_LIB_PATH)
        _bind(lib)
        if lib.tricolo_native_abi_version() != _ABI_VERSION:
            return False
        _lib = lib
        return True
    except (subprocess.CalledProcessError, OSError, AttributeError, FileNotFoundError):
        return False


def available() -> bool:
    """Library loadable (building on first call)? Never raises."""
    global _tried
    if _lib is not None:
        return True
    if _tried:
        return False
    _tried = True
    return ensure_built()


def dense_rgba_to_packed(grid: np.ndarray):
    """(4, D, D, D) uint8 C-order RGBA grid → (flat u32, rgb u32)."""
    if not available():
        raise RuntimeError("native library unavailable; use the numpy fallback")
    grid = np.ascontiguousarray(grid, dtype=np.uint8)
    d = grid.shape[1]
    cap = d * d * d
    flat = np.empty(cap, np.uint32)
    rgb = np.empty(cap, np.uint32)
    count = _lib.tricolo_dense_rgba_to_packed(
        grid.ctypes.data, d, flat.ctypes.data, rgb.ctypes.data, cap
    )
    return flat[:count].copy(), rgb[:count].copy()


def packed_to_dense(flat: np.ndarray, rgb: np.ndarray, d: int) -> np.ndarray:
    """Packed (B, N) u32 pairs → dense (B, d, d, d) u32 grid (C++ sweep)."""
    if not available():
        raise RuntimeError("native library unavailable; use the numpy fallback")
    flat = np.ascontiguousarray(flat, dtype=np.uint32)
    rgb = np.ascontiguousarray(rgb, dtype=np.uint32)
    batch, n_points = flat.shape
    grid = np.empty((batch, d, d, d), np.uint32)
    _lib.tricolo_packed_to_dense(
        flat.ctypes.data, rgb.ctypes.data, batch, n_points, d, grid.ctypes.data
    )
    return grid


def packed_to_windowed(
    flat: np.ndarray, rgb: np.ndarray, d: int, tile: int = 8, halo: int = 1
):
    """Packed (B, N) u32 pairs → halo'd window rows.

    Returns (rows (B·tg³, s³) u32, tile_occ (B·tg³,) u8) with
    s = tile + 2·halo — the host half of voxel_transfer=windowed (see the
    C++ docstring for the layout contract)."""
    if not available():
        raise RuntimeError("native library unavailable; use the numpy fallback")
    flat = np.ascontiguousarray(flat, dtype=np.uint32)
    rgb = np.ascontiguousarray(rgb, dtype=np.uint32)
    batch, n_points = flat.shape
    tg = d // tile
    s = tile + 2 * halo
    rows = np.empty((batch * tg**3, s**3), np.uint32)
    occ = np.empty(batch * tg**3, np.uint8)
    _lib.tricolo_packed_to_windowed(
        flat.ctypes.data, rgb.ctypes.data, batch, n_points, d, tile, halo,
        rows.ctypes.data, occ.ctypes.data,
    )
    return rows, occ


def packed_to_windowed_compact(
    flat: np.ndarray, rgb: np.ndarray, d: int, k: int,
    tile: int = 8, halo: int = 1,
):
    """Packed (B, N) u32 pairs → PER-SAMPLE compacted halo'd window rows.

    Returns (rows (B, k, s³) u32, local_ids (B, k) i32, counts (B,) i32):
    each sample's rows cover its first ``k`` active tiles in ascending
    tile-id order (the device's nonzero(size=) truncation rule); local_ids
    padding is the tg³ sentinel; counts holds each sample's TOTAL active
    tiles (count > k ⇒ truncation — the loader decides error vs warn).
    The per-sample axis lets the rows shard with their samples under a
    data-parallel mesh. ~5-10× less host writing and H2D than the full
    windowed layout at solid-shape occupancy."""
    if not available():
        raise RuntimeError("native library unavailable; use the numpy fallback")
    flat = np.ascontiguousarray(flat, dtype=np.uint32)
    rgb = np.ascontiguousarray(rgb, dtype=np.uint32)
    batch, n_points = flat.shape
    s = tile + 2 * halo
    rows = np.empty((batch, k, s**3), np.uint32)
    local_ids = np.empty((batch, k), np.int32)
    counts = np.empty(batch, np.int32)
    _lib.tricolo_packed_to_windowed_compact(
        flat.ctypes.data, rgb.ctypes.data, batch, n_points, d, tile, halo,
        k, rows.ctypes.data, local_ids.ctypes.data, counts.ctypes.data,
    )
    return rows, local_ids, counts


def load_npz_voxels_packed(path: str, member: str, n_cap: int | None = None):
    """Fused npz→packed loader; returns (flat u32, rgb u32)."""
    if not available():
        raise RuntimeError("native library unavailable; use the numpy fallback")
    err = ctypes.create_string_buffer(256)
    if n_cap is None:
        n_cap = 256**3  # upper bound; grids are ≤128³
    flat = np.empty(n_cap, np.uint32)
    rgb = np.empty(n_cap, np.uint32)
    d_out = ctypes.c_int64()
    count = _lib.tricolo_load_npz_voxels_packed(
        path.encode(), member.encode(), flat.ctypes.data, rgb.ctypes.data,
        n_cap, ctypes.byref(d_out), err, len(err),
    )
    if count < 0:
        raise ValueError(f"{path}[{member}]: {err.value.decode()}")
    if count > n_cap:
        raise ValueError(f"{path}[{member}]: {count} sites exceed cap {n_cap}")
    return flat[:count].copy(), rgb[:count].copy()


def npz_read(path: str, member: str) -> bytes:
    """Raw npz member bytes (the .npy payload), natively decompressed."""
    if not available():
        raise RuntimeError("native library unavailable")
    err = ctypes.create_string_buffer(256)
    size = _lib.tricolo_npz_read(path.encode(), member.encode(), None, 0, err, len(err))
    if size < 0:
        raise ValueError(f"{path}[{member}]: {err.value.decode()}")
    out = np.empty(size, np.uint8)
    got = _lib.tricolo_npz_read(
        path.encode(), member.encode(), out.ctypes.data, size, err, len(err)
    )
    if got < 0:
        raise ValueError(f"{path}[{member}]: {err.value.decode()}")
    return out.tobytes()


def gzip_decode(data: bytes, expected_size: int) -> bytes:
    """Native gzip decode (NRRD payloads)."""
    if not available():
        raise RuntimeError("native library unavailable")
    src = np.frombuffer(data, np.uint8)
    out = np.empty(expected_size, np.uint8)
    got = _lib.tricolo_gzip_decode(src.ctypes.data, len(data), out.ctypes.data, expected_size)
    if got < 0:
        raise ValueError("gzip stream corrupt or buffer too small")
    return out[:got].tobytes()
