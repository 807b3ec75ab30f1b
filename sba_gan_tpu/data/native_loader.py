"""ctypes bridge to the native C++ image-loading pipeline.

Builds ``libsba_loader.so`` from ``sba_gan_tpu/native/sba_loader.cpp`` on
first use (g++ -O3, links libjpeg) and exposes :class:`NativeImageLoader`.
Falls back cleanly when the toolchain or libjpeg is unavailable —
``NativeImageLoader.available()`` gates the fast path, and
:class:`sba_gan_tpu.data.cub.TextImageDataset` keeps PIL as the parity path
(SURVEY.md hard-part #7: PIL for parity mode, native for speed mode).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SRC = os.path.join(_NATIVE_DIR, "sba_loader.cpp")
_SO = os.path.join(_NATIVE_DIR, "libsba_loader.so")

_lib = None
_tried = False


def _build() -> Optional[str]:
    if os.path.isfile(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC, "-ljpeg"],
            check=True, capture_output=True, timeout=120,
        )
        return _SO
    except Exception:
        return None


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    so = _build()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.sba_load_image.restype = ctypes.c_int
    lib.sba_load_image.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),  # bbox or None
        ctypes.c_int, ctypes.c_int,    # pre_w, pre_h
        ctypes.POINTER(ctypes.c_int),  # crop2 or None
        ctypes.c_int,                  # hflip
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,  # sizes, n
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
    ]
    _lib = lib
    return lib


class NativeImageLoader:
    """JPEG decode -> bbox crop -> resize -> crop -> flip -> multiscale
    [-1,1] float32, all in C++."""

    @staticmethod
    def available() -> bool:
        return _load() is not None

    def load(
        self,
        path: str,
        sizes: Sequence[int],
        bbox: Optional[Sequence[int]] = None,   # (x0, y0, w, h)
        pre_size: Optional[object] = None,       # int (square) or (w, h)
        crop2: Optional[Sequence[int]] = None,   # (x0, y0, w, h)
        hflip: bool = False,
    ) -> List[np.ndarray]:
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        n = len(sizes)
        outs = [np.empty((s, s, 3), np.float32) for s in sizes]
        out_ptrs = (ctypes.POINTER(ctypes.c_float) * n)(
            *[o.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for o in outs]
        )
        sizes_arr = (ctypes.c_int * n)(*sizes)
        bbox_arr = (ctypes.c_int * 4)(*bbox) if bbox is not None else None
        crop_arr = (ctypes.c_int * 4)(*crop2) if crop2 is not None else None
        if pre_size is None:
            pw = ph = 0
        elif isinstance(pre_size, (tuple, list)):
            pw, ph = int(pre_size[0]), int(pre_size[1])
        else:
            pw = ph = int(pre_size)
        rc = lib.sba_load_image(
            path.encode(), bbox_arr, pw, ph, crop_arr, int(hflip),
            sizes_arr, n, out_ptrs,
        )
        if rc != 0:
            raise IOError(f"native decode failed ({rc}): {path}")
        return outs
