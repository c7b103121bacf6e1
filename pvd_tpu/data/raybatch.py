"""ctypes bindings for the native ray-batch producer (native/raybatch.cpp).

Replaces the reference's torch DataLoader + collate host path
(provider.py:284-326) with a multithreaded C++ producer of
(image index, pixel indices, GT pixels) batches; Python fallback when the
shared library hasn't been built.  Build with `sh native/build.sh`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "lib", "libraybatch.so",
)
_SRC_DIR = os.path.dirname(os.path.dirname(_LIB_PATH))


def _load_lib(build_if_missing: bool = True):
    if not os.path.exists(_LIB_PATH) and build_if_missing:
        try:
            subprocess.run(
                ["sh", os.path.join(_SRC_DIR, "build.sh")],
                check=True, capture_output=True,
            )
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.rb_create.restype = ctypes.c_void_p
    lib.rb_create.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
        ctypes.c_int, ctypes.c_int,
    ]
    lib.rb_next.restype = ctypes.c_int
    lib.rb_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.rb_destroy.argtypes = [ctypes.c_void_p]
    return lib


def native_available() -> bool:
    return _load_lib(build_if_missing=True) is not None


class RayBatcher:
    """Producer of (img_index, inds [n_rays], pixels [n_rays, C]) batches.

    `images` must stay alive for the batcher's lifetime (zero-copy on the
    C++ side).  Falls back to numpy sampling when the native lib is absent.
    """

    def __init__(self, images: np.ndarray, n_rays: int, seed: int = 0,
                 queue_depth: int = 4, n_threads: int = 2):
        assert images.ndim == 4, "images must be [B, H, W, C]"
        self._images = np.ascontiguousarray(images, np.float32)
        b, h, w, c = self._images.shape
        self.n_rays = n_rays
        self.channels = c
        self._hw = h * w
        self._lib = _load_lib()
        self._handle = None
        self._rng: Optional[np.random.Generator] = None
        if self._lib is not None:
            self._handle = self._lib.rb_create(
                self._images.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                b, h, w, c, n_rays, seed, queue_depth, n_threads,
            )
        else:
            self._rng = np.random.default_rng(seed)
        self._inds = np.empty(n_rays, np.int32)
        self._pix = np.empty((n_rays, c), np.float32)

    @property
    def is_native(self) -> bool:
        return self._handle is not None

    def next(self) -> Tuple[int, np.ndarray, np.ndarray]:
        if self._handle is not None:
            img_idx = self._lib.rb_next(
                self._handle,
                self._inds.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                self._pix.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
            return img_idx, self._inds.copy(), self._pix.copy()
        # numpy fallback
        flat = self._images.reshape(len(self._images), self._hw, self.channels)
        img_idx = int(self._rng.integers(0, len(flat)))
        inds = self._rng.integers(0, self._hw, self.n_rays).astype(np.int32)
        return img_idx, inds, flat[img_idx, inds]

    def gather(self, img_idx: int, inds: np.ndarray) -> np.ndarray:
        """Pixels for CALLER-chosen indices (error-map importance sampling:
        the draw depends on the latest error map, so the prefetch threads
        cannot run ahead of it — a synchronous host gather of n_rays rows
        is the whole job and costs microseconds)."""
        flat = self._images.reshape(len(self._images), self._hw,
                                    self.channels)
        return flat[int(img_idx), np.asarray(inds, np.int64)]

    def close(self):
        if self._handle is not None:
            self._lib.rb_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
