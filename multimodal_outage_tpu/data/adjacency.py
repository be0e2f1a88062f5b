"""County-contiguity graph adjacency loading and normalization.

Equivalent of the reference's load_adj/asym_adj (reference utils.py:152-180,
duplicated at models/graph_wavenet.py:13-32, executed at import time there).
Here: explicit, config-time, numpy-only, no side effects.

The reference's "doubletransition" branch actually returns a single identity
matrix (reference utils.py:171-172) and its asym_adj is dead code
(SURVEY §8.4). We implement both: "identity" reproduces the reference
behavior; "doubletransition" is the true Graph WaveNet dual random-walk
support set [asym_adj(A), asym_adj(Aᵀ)].
"""

from __future__ import annotations

import csv
import os
from typing import List, Sequence, Tuple

import numpy as np

# packaged with the wheel (pyproject [tool.setuptools.package-data])
_ASSET = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets",
    "graph",
    "adj_mx_fl.csv",
)


def default_adjacency_path() -> str:
    return os.path.normpath(_ASSET)


def load_adjacency_csv(path: str | None = None) -> Tuple[List[str], np.ndarray]:
    """Read a header+rows adjacency CSV → (county_names, dense [N, N] float32).

    Layout matches assets/graph/adj_mx_fl.csv: header row of county names,
    each data row = [county_name, a_0, ..., a_{N-1}].
    """
    path = path or default_adjacency_path()
    with open(path, newline="") as f:
        reader = csv.reader(f)
        header = next(reader)
        names = [h.strip() for h in header[1:]]
        rows = []
        for row in reader:
            rows.append([float(v) for v in row[1:]])
    adj = np.asarray(rows, dtype=np.float32)
    if adj.shape != (len(names), len(names)):
        raise ValueError(f"Adjacency shape {adj.shape} != ({len(names)},)*2")
    return names, adj


def asym_adj(adj: np.ndarray) -> np.ndarray:
    """Row-normalized transition matrix D⁻¹A (dense; N=67 is tiny).

    Equivalent to reference utils.py:152-158 without scipy.sparse.
    """
    adj = np.asarray(adj, dtype=np.float64)
    rowsum = adj.sum(axis=1)
    d_inv = np.where(rowsum > 0, 1.0 / np.where(rowsum > 0, rowsum, 1.0), 0.0)
    return (d_inv[:, None] * adj).astype(np.float32)


def build_supports(adj: np.ndarray, adjtype: str = "identity") -> List[np.ndarray]:
    """Static GCN diffusion supports.

    adjtype:
      "identity"          — single I_N, reproducing the reference's
                            "doubletransition" quirk (reference utils.py:171).
      "doubletransition"  — true dual random-walk [D⁻¹A, D⁻¹Aᵀ].
      "transition"        — single forward random walk [D⁻¹A].
    """
    n = adj.shape[0]
    if adjtype == "identity":
        return [np.eye(n, dtype=np.float32)]
    if adjtype == "transition":
        return [asym_adj(adj)]
    if adjtype == "doubletransition":
        return [asym_adj(adj), asym_adj(adj.T)]
    raise ValueError(f"adj type {adjtype!r} not defined")


def load_supports(
    path: str | None = None, adjtype: str = "identity"
) -> Tuple[List[str], List[np.ndarray]]:
    names, adj = load_adjacency_csv(path)
    return names, build_supports(adj, adjtype)


def synthetic_adjacency(n: int, seed: int = 0, density: float = 0.15) -> np.ndarray:
    """Random symmetric binary contiguity matrix for small-N tests."""
    rng = np.random.default_rng(seed)
    a = (rng.random((n, n)) < density).astype(np.float32)
    a = np.maximum(a, a.T)
    np.fill_diagonal(a, 0.0)
    return a
