"""Seeding: one call pins every host-side RNG plus the JAX root key.

Role parity with lightning's seed_everything as used by the reference
(train.py:26, test.py:13 with seeds 123/321 from config.yaml:18-19).
"""

from __future__ import annotations

import random

import numpy as np


def seed_everything(seed: int):
    random.seed(seed)
    np.random.seed(seed)
    import jax

    return jax.random.PRNGKey(seed)
