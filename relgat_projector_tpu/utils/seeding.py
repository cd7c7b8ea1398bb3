"""Deterministic seeding (reference ``utils/random_seed.py:9-25``).

JAX is functionally seeded (explicit PRNG keys), so unlike the reference
there is no global device RNG to pin; we seed Python/NumPy for host-side
work (splits, synthetic data) and hand out the root JAX key.
"""

from __future__ import annotations

import random

import jax
import numpy as np


class RandomSeed:
    def __init__(self, seed: int, auto_set_seed: bool = True):
        self.seed = int(seed)
        if auto_set_seed:
            self.set_random_state()

    def set_random_state(self) -> None:
        random.seed(self.seed)
        np.random.seed(self.seed)

    def jax_key(self) -> jax.Array:
        return jax.random.PRNGKey(self.seed)
