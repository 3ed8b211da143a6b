"""Field I/O compatible with the reference's text dumps.

The reference writes tab-separated `%f` rows (uT.txt, multigrid.cpp:269-275;
uTcuda.txt, multigrid.cu:260-266) consumed by uTplot.py/uTerr.py via
np.loadtxt.  `save_field_txt`/`load_field_txt` reproduce that format;
`save_field`/`load_field` use .npy for lossless round-trips.
"""

from __future__ import annotations

import pathlib

import numpy as np


def save_field_txt(path, field) -> None:
    """Tab-separated text dump, one grid row per line (multigrid.cpp:269-275)."""
    np.savetxt(path, np.asarray(field), fmt="%f", delimiter="\t")


def load_field_txt(path) -> np.ndarray:
    return np.loadtxt(path)


def save_field(path, field) -> None:
    np.save(path, np.asarray(field))


def load_field(path) -> np.ndarray:
    return np.load(path)


def field_difference_norm(a, b) -> float:
    """Frobenius norm of the difference — the uTerr.py:58 cross-backend
    correctness check."""
    return float(np.linalg.norm(np.asarray(a) - np.asarray(b)))


def ensure_dir(path) -> pathlib.Path:
    p = pathlib.Path(path)
    p.mkdir(parents=True, exist_ok=True)
    return p
