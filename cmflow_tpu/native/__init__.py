"""Native (C++) host-side runtime components, consumed via ctypes.

``sample_codec``: specialized JSON decoder for the scene-flow sample
schema — the hot host-side path that the reference leaves to python
ujson in DataLoader workers (dataset/vod.py:52-53).  Built on first use
with g++; every consumer has a pure-python fallback, so the framework
works without a compiler too.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "sample_codec.cpp")
_LIB = os.path.join(_HERE, "libsamplecodec.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


class _CmfMat(ctypes.Structure):
    _fields_ = [
        ("data", ctypes.POINTER(ctypes.c_float)),
        ("rows", ctypes.c_int64),
        ("cols", ctypes.c_int64),
    ]


class _CmfSample(ctypes.Structure):
    _fields_ = [
        ("pc1", _CmfMat), ("pc2", _CmfMat), ("trans", _CmfMat),
        ("gt_labels", _CmfMat), ("pse_labels", _CmfMat),
        ("opt_flow", _CmfMat), ("gt_mask", _CmfMat), ("pse_mask", _CmfMat),
        ("radar_u", _CmfMat), ("radar_v", _CmfMat),
        ("ok", ctypes.c_int32),
    ]


def _build() -> Optional[str]:
    if os.path.exists(_LIB) and (os.path.getmtime(_LIB)
                                 >= os.path.getmtime(_SRC)):
        return _LIB
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the codec library; None if unavailable."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        path = _build()
        if path is None:
            _build_failed = True
            return None
        lib = ctypes.CDLL(path)
        lib.cmflow_parse_sample.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.POINTER(_CmfSample)]
        lib.cmflow_parse_sample.restype = ctypes.c_int
        lib.cmflow_free_sample.argtypes = [ctypes.POINTER(_CmfSample)]
        lib.cmflow_free_sample.restype = None
        _lib = lib
    return _lib


def _mat_to_numpy(m: _CmfMat) -> np.ndarray:
    if not m.data or m.rows == 0:
        shape = (0,) if m.cols == 0 else (0, int(m.cols))
        return np.zeros(shape, np.float32)
    count = int(m.rows) * max(int(m.cols), 1)
    arr = np.ctypeslib.as_array(m.data, shape=(count,)).copy()
    if m.cols > 0:
        return arr.reshape(int(m.rows), int(m.cols))
    return arr


def parse_sample_bytes(buf: bytes) -> Optional[Dict[str, np.ndarray]]:
    """Decode one raw sample JSON with the native codec.  Returns the raw
    field dict (same keys as the json schema, numeric fields as numpy) or
    None when the native library is unavailable/fails."""
    lib = get_lib()
    if lib is None:
        return None
    out = _CmfSample()
    rc = lib.cmflow_parse_sample(buf, len(buf), ctypes.byref(out))
    if not rc:
        return None
    try:
        return {
            "pc1": _mat_to_numpy(out.pc1),
            "pc2": _mat_to_numpy(out.pc2),
            "trans": _mat_to_numpy(out.trans),
            "gt_labels": _mat_to_numpy(out.gt_labels),
            "pse_labels": _mat_to_numpy(out.pse_labels),
            "gt_mask": _mat_to_numpy(out.gt_mask),
            "pse_mask": _mat_to_numpy(out.pse_mask),
            "opt_info": {
                "radar_u": _mat_to_numpy(out.radar_u),
                "radar_v": _mat_to_numpy(out.radar_v),
                "opt_flow": _mat_to_numpy(out.opt_flow),
            },
        }
    finally:
        lib.cmflow_free_sample(ctypes.byref(out))


def parse_sample_file(path: str) -> Optional[Dict[str, np.ndarray]]:
    with open(path, "rb") as f:
        return parse_sample_bytes(f.read())
