"""ctypes bindings for the native data generators (native/datagen.cpp).

The reference generates mazes/sudokus in pure python inside __getitem__
(maze.py:945-966, sudoku.py:108-119) — far too slow to feed a TPU. The C++
library generates batches at production rates; python generators remain the
fallback when the .so hasn't been built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libdatagen.so",
)
_lib = None


def _load(build_if_missing: bool = True):
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and build_if_missing:
        try:
            subprocess.run(
                ["make", "-C", os.path.dirname(_LIB_PATH)],
                check=True,
                capture_output=True,
            )
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.maze_gen_batch.restype = ctypes.c_int
    lib.maze_gen_batch.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ctypes.c_double, ctypes.c_int, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.sudoku_gen_batch.restype = ctypes.c_int
    lib.sudoku_gen_batch.argtypes = [
        ctypes.c_int, ctypes.c_uint64, ctypes.POINTER(ctypes.c_int8),
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def maze_gen_native(
    n: int,
    dim_x: int = 7,
    dim_y: int = 7,
    weight_high: float = 99.0,
    weight_low: float = 97.0,
    random_transform: bool = True,
    seed: int = 0,
) -> Optional[np.ndarray]:
    """(n, 1, H, W) solved mazes in {0,1,2}, or None if the lib is absent."""
    lib = _load()
    if lib is None:
        return None
    H, W = 2 * dim_y + 1, 2 * dim_x + 1
    out = np.empty((n, H, W), np.uint8)
    produced = lib.maze_gen_batch(
        n, dim_x, dim_y, weight_high, weight_low, int(random_transform),
        seed, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if produced < n:
        return None
    return out[:, None, :, :]


def sudoku_gen_native(n: int, seed: int = 0) -> Optional[np.ndarray]:
    """(n, 81) solved boards with cell values 0..8, or None."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((n, 81), np.int8)
    lib.sudoku_gen_batch(n, seed, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)))
    return out.astype(np.int32)
