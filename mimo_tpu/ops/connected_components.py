"""Connected components on binary masks: native C++ union-find with scipy
fallback.

Equivalent of the reference SAM2 CUDA kernel
(segment-anything-2-main/sam2/csrc/connected_components.cu, driven from
sam2/utils/misc.py:47-63) used to fill holes / drop specks in predicted
masks before writing mask.mp4. The native library (native/cc_labeling.cpp)
builds on demand with `make -C native`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")


def _load_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    so = os.path.join(_NATIVE_DIR, "libcc_labeling.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
        lib.cc_label.restype = ctypes.c_int32
        lib.cc_label.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32]
        lib.cc_clean.restype = None
        lib.cc_clean.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def label(mask: np.ndarray) -> Tuple[np.ndarray, int]:
    """4-connected component labels of a binary mask. Returns
    (labels int32 HxW with 0 background, num_components)."""
    mask = np.ascontiguousarray(mask.astype(np.uint8))
    h, w = mask.shape
    lib = _load_lib()
    if lib is not None:
        labels = np.zeros((h, w), np.int32)
        n = lib.cc_label(
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), None, 0)
        return labels, int(n)
    from scipy import ndimage
    labels, n = ndimage.label(mask,
                              structure=np.array([[0, 1, 0], [1, 1, 1],
                                                  [0, 1, 0]]))
    return labels.astype(np.int32), int(n)


def clean_mask(mask: np.ndarray, min_area: int = 64,
               fill_holes: bool = True) -> np.ndarray:
    """Drop foreground specks < min_area; fill interior background holes <
    min_area (the sam2 get_connected_components post-step)."""
    m = np.ascontiguousarray(mask.astype(np.uint8))
    h, w = m.shape
    lib = _load_lib()
    if lib is not None:
        lib.cc_clean(m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
                     min_area, 1 if fill_holes else 0)
        return m.astype(bool)
    # scipy fallback
    from scipy import ndimage
    s4 = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]])
    labels, n = ndimage.label(m, structure=s4)
    if n:
        areas = np.bincount(labels.ravel())
        small = np.isin(labels, np.nonzero(areas < min_area)[0]) & (labels > 0)
        m[small] = 0
    if fill_holes:
        inv = (m == 0).astype(np.uint8)
        labels, n = ndimage.label(inv, structure=s4)
        if n:
            areas = np.bincount(labels.ravel())
            border = np.unique(np.concatenate([
                labels[0], labels[-1], labels[:, 0], labels[:, -1]]))
            for lab in range(1, n + 1):
                if lab not in border and areas[lab] < min_area:
                    m[labels == lab] = 1
    return m.astype(bool)
