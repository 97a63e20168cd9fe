"""Native serialization: npz graph format + Orbax-backed checkpoints.

The npz layout is the framework-native replacement for the reference's
``torch.save(Data)`` pickles (main_bridged_graph.py:320): a flat dict of
arrays ``x, edge_index, y, train_mask, val_mask, test_mask, central_mask``.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

_GRAPH_KEYS = (
    "x", "edge_index", "y", "train_mask", "val_mask", "test_mask",
    "central_mask",
)


def save_graph_npz(path: str, data: Dict[str, np.ndarray]) -> None:
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in data.items()})


def load_graph_npz(path: str) -> Dict[str, np.ndarray]:
    with np.load(path, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}
