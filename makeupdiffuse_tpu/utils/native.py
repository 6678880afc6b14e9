"""ctypes bindings for the native host library (native/mdt_host.cc), with numpy
fallbacks so the framework runs without the .so.

The native tier covers the data pipeline's CPU hot loop — image resize+normalize,
label-map nearest resize, masked CDFs, component-mask expansion — the role
OpenCV/dlib play for the reference (SURVEY.md §2 preamble).
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "native", "libmdt_host.so",
    )
    if not os.path.exists(path):
        # build on demand when a toolchain exists
        try:
            import subprocess

            subprocess.run(
                ["sh", os.path.join(os.path.dirname(path), "build.sh")],
                check=True, capture_output=True,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(path)
        assert lib.mdt_host_abi_version() == 2
        lib.mdt_pool_create.restype = ctypes.c_void_p
        lib.mdt_pool_destroy.argtypes = [ctypes.c_void_p]
        lib.mdt_pool_size.argtypes = [ctypes.c_void_p]
        lib.mdt_pool_size.restype = ctypes.c_int
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _lib() is not None


_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")


def resize_normalize(
    img: np.ndarray, out_hw: int, scale: float = 1.0 / 127.5, offset: float = -1.0
) -> np.ndarray:
    """uint8 [H,W,C] → float32 [out,out,C], bilinear, y = x·scale + offset."""
    lib = _lib()
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    if lib is not None:
        out = np.empty((out_hw, out_hw, c), np.float32)
        lib.resize_normalize_u8(
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int(h), ctypes.c_int(w), ctypes.c_int(c),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int(out_hw), ctypes.c_int(out_hw),
            ctypes.c_float(scale), ctypes.c_float(offset),
        )
        return out
    from PIL import Image

    pil = Image.fromarray(img).resize((out_hw, out_hw), Image.BILINEAR)
    return np.asarray(pil, np.float32) * scale + offset


def resize_labels(labels: np.ndarray, out_hw: int) -> np.ndarray:
    """uint8 [H,W] label map → int32 [out,out], nearest."""
    lib = _lib()
    labels = np.ascontiguousarray(labels, np.uint8)
    h, w = labels.shape
    if lib is not None:
        out = np.empty((out_hw, out_hw), np.int32)
        lib.resize_nearest_labels(
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int(h), ctypes.c_int(w),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_int(out_hw), ctypes.c_int(out_hw),
        )
        return out
    ys = np.minimum(((np.arange(out_hw) + 0.5) * h / out_hw).astype(int), h - 1)
    xs = np.minimum(((np.arange(out_hw) + 0.5) * w / out_hw).astype(int), w - 1)
    return labels[np.ix_(ys, xs)].astype(np.int32)


def masked_cdf(img: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """float32 [N,C] intensities in [0,255] + [N] weights → [C,256] CDFs."""
    lib = _lib()
    img = np.ascontiguousarray(img, np.float32)
    mask = np.ascontiguousarray(mask, np.float32)
    n, c = img.shape
    if lib is not None:
        out = np.empty((c, 256), np.float32)
        lib.masked_cdf_f32(
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int(n), ctypes.c_int(c),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out
    out = np.zeros((c, 256), np.float32)
    idx = np.clip(img, 0, 255).astype(np.int32)
    for ch in range(c):
        hist = np.bincount(idx[:, ch], weights=mask, minlength=256)[:256]
        total = hist.sum()
        out[ch] = np.cumsum(hist / total) if total > 0 else 0.0
    return out


def class_masks(labels: np.ndarray, groups: Sequence[Sequence[int]]) -> np.ndarray:
    """int32 [H,W] labels + class groups → float32 [H,W,K] component masks."""
    lib = _lib()
    labels = np.ascontiguousarray(labels, np.int32)
    h, w = labels.shape
    flat_classes = np.asarray([c for g in groups for c in g], np.int32)
    offsets = np.cumsum([0] + [len(g) for g in groups]).astype(np.int32)
    k = len(groups)
    if lib is not None:
        out = np.empty((h * w, k), np.float32)
        lib.class_masks_i32(
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_int(h * w),
            flat_classes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_int(k),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out.reshape(h, w, k)
    out = np.zeros((h, w, k), np.float32)
    for i, g in enumerate(groups):
        out[..., i] = np.isin(labels, list(g)).astype(np.float32)
    return out


class BatchExecutor:
    """Persistent native worker pool assembling whole batches in parallel.

    The framework's explicit version of the native worker tier the reference
    gets from torch's ``DataLoader(num_workers=2)`` (/root/reference/runs/
    train.py:32): ONE ctypes call per batch (the GIL is released for its whole
    duration), a C++ thread pool fans the per-image resize+normalize across
    host cores, and the result is a single contiguous array ready for one
    ``jax.device_put``. Falls back to sequential numpy/PIL without the .so.
    """

    def __init__(self, n_threads: Optional[int] = None):
        if n_threads is None:
            n_threads = max(os.cpu_count() or 1, 1)
        self._lib = _lib()
        self._pool = (
            self._lib.mdt_pool_create(ctypes.c_int(n_threads))
            if self._lib is not None else None
        )
        self.n_threads = (
            self._lib.mdt_pool_size(self._pool) if self._pool else 1
        )

    def __del__(self):
        pool, self._pool = self._pool, None
        if pool and self._lib is not None:
            self._lib.mdt_pool_destroy(pool)

    def _ptrs_shapes(self, images, dims: int):
        arrs = [np.ascontiguousarray(im, np.uint8) for im in images]
        Ptr = ctypes.POINTER(ctypes.c_uint8)
        ptrs = (Ptr * len(arrs))(*[a.ctypes.data_as(Ptr) for a in arrs])
        shapes = np.asarray([a.shape[:dims] for a in arrs], np.int32)
        return arrs, ptrs, shapes

    def resize_normalize(
        self, images: Sequence[np.ndarray], out_hw: int,
        scale: float = 1.0 / 127.5, offset: float = -1.0,
    ) -> np.ndarray:
        """B×(uint8 [H,W,C], varied sizes) → float32 [B,out,out,C]."""
        if self._pool is None:
            return np.stack([resize_normalize(im, out_hw, scale, offset)
                             for im in images])
        c = int(images[0].shape[-1])
        arrs, ptrs, shapes = self._ptrs_shapes(images, 3)
        assert all(int(s[2]) == c for s in shapes), "mixed channel counts"
        out = np.empty((len(arrs), out_hw, out_hw, c), np.float32)
        self._lib.mdt_batch_resize_normalize(
            ctypes.c_void_p(self._pool), ptrs,
            shapes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_int(len(arrs)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int(out_hw), ctypes.c_int(out_hw), ctypes.c_int(c),
            ctypes.c_float(scale), ctypes.c_float(offset),
        )
        return out

    def resize_labels(self, labels: Sequence[np.ndarray], out_hw: int) -> np.ndarray:
        """B×(uint8 [H,W] label maps) → int32 [B,out,out], nearest."""
        if self._pool is None:
            return np.stack([resize_labels(lm, out_hw) for lm in labels])
        arrs, ptrs, shapes = self._ptrs_shapes(labels, 2)
        out = np.empty((len(arrs), out_hw, out_hw), np.int32)
        self._lib.mdt_batch_resize_labels(
            ctypes.c_void_p(self._pool), ptrs,
            shapes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_int(len(arrs)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_int(out_hw), ctypes.c_int(out_hw),
        )
        return out


_EXECUTOR: Optional[BatchExecutor] = None


def batch_executor() -> BatchExecutor:
    """Process-wide default executor (lazily created, pool sized to the host)."""
    global _EXECUTOR
    if _EXECUTOR is None:
        _EXECUTOR = BatchExecutor()
    return _EXECUTOR
