"""Seeding across the RNGs the framework touches (reference utils.py:10-17).

JAX randomness is functional (explicit PRNGKeys threaded through training),
so this only pins the host-side RNGs: python, numpy, torch (used for
reference-parity dataset splits).
"""

import random

import numpy as np
import torch


def set_random_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)
    torch.manual_seed(seed)
