"""ctypes bindings for the native host kernels (with NumPy fallbacks).

Builds libphysdock_native.so on first use via make; if the toolchain or
build is unavailable every function transparently falls back to NumPy, so
the framework never hard-depends on the native library.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libphysdock_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _DIR, "-s"], check=True, capture_output=True
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.a3m_dims.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.a3m_parse.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int8),
            ctypes.POINTER(ctypes.c_int8),
        ]
        lib.pairwise_rmsd.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.conformer_dist_bank.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.perceive_bonds.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.c_float,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
        ]
        lib.perceive_bonds.restype = ctypes.c_int64
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def parse_a3m_int8(text: str) -> Tuple[np.ndarray, np.ndarray]:
    """A3M text -> (msa int8 [N, L], deletions int8 [N, L])."""
    lib = _load()
    if lib is None:
        from physdock_tpu.data.msa.parsers import parse_a3m
        from physdock_tpu.data.msa.search import msa_to_int8

        f = msa_to_int8(parse_a3m(text))
        return f["msa"], f["deletion_matrix"]
    raw = text.encode()
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    lib.a3m_dims(raw, ctypes.byref(rows), ctypes.byref(cols))
    msa = np.empty((rows.value, cols.value), np.int8)
    dele = np.empty((rows.value, cols.value), np.int8)
    lib.a3m_parse(
        raw, rows.value, cols.value, _ptr(msa, ctypes.c_int8), _ptr(dele, ctypes.c_int8)
    )
    return msa, dele


def pairwise_rmsd(poses: np.ndarray) -> np.ndarray:
    """[S, L, 3] -> [S, S] RMSD matrix."""
    poses = np.ascontiguousarray(poses, np.float32)
    lib = _load()
    if lib is None:
        diff = poses[:, None] - poses[None]
        return np.sqrt(np.mean(np.sum(diff**2, -1), -1)).astype(np.float32)
    s, l, _ = poses.shape
    out = np.empty((s, s), np.float32)
    lib.pairwise_rmsd(_ptr(poses, ctypes.c_float), s, l, _ptr(out, ctypes.c_float))
    return out


def conformer_dist_bank(confs: np.ndarray) -> np.ndarray:
    """[C, L, 3] -> [C, L, L] distance matrices."""
    confs = np.ascontiguousarray(confs, np.float32)
    lib = _load()
    if lib is None:
        return np.linalg.norm(
            confs[:, :, None] - confs[:, None], axis=-1
        ).astype(np.float32)
    c, l, _ = confs.shape
    out = np.empty((c, l, l), np.float32)
    lib.conformer_dist_bank(
        _ptr(confs, ctypes.c_float), c, l, _ptr(out, ctypes.c_float)
    )
    return out


def perceive_bonds(
    pos: np.ndarray, atomic_numbers: np.ndarray, scale: float = 1.3
) -> List[Tuple[int, int]]:
    """Distance-based covalent bond perception."""
    pos = np.ascontiguousarray(pos, np.float32)
    z = np.ascontiguousarray(atomic_numbers, np.int32)
    lib = _load()
    n = len(z)
    if lib is None:
        from physdock_tpu.data.embed import _COV_RADII

        out = []
        for i in range(n):
            for j in range(i + 1, n):
                d = np.linalg.norm(pos[i] - pos[j])
                rmax = scale * (
                    _COV_RADII.get(int(z[i]), 1.2) + _COV_RADII.get(int(z[j]), 1.2)
                )
                if 0.5 < d < rmax:
                    out.append((i, j))
        return out
    max_bonds = n * 8
    buf = np.empty((max_bonds, 2), np.int32)
    count = lib.perceive_bonds(
        _ptr(pos, ctypes.c_float), _ptr(z, ctypes.c_int32), n,
        ctypes.c_float(scale), _ptr(buf, ctypes.c_int32), max_bonds,
    )
    return [tuple(map(int, b)) for b in buf[:count]]
