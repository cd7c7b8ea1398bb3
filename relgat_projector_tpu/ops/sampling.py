"""Device-resident negative sampling.

The reference corrupts destinations on the CPU with a Python
``random.choice`` rejection loop per negative (``dataset/edge.py:100-113``).
On TPU, sampling happens inside the jitted train step with ``jax.random``:

Uniform over the ``num_nodes - 1`` nodes different from the true destination
via the shift trick — sample ``c ~ U[0, N-1)`` and add 1 when ``c >= dst``.
This gives exactly the reference's distribution (uniform over all nodes
except the true dst) with static shapes, no rejection loop, and cross-host
reproducibility from the folded key.
"""

from __future__ import annotations

import jax


def sample_negative_dst(
    rng: jax.Array,
    dst: jax.Array,   # [B] true destination ids (compact, < num_nodes)
    num_nodes: int,
    num_neg: int,
) -> jax.Array:
    """Return corrupted destinations ``[B, num_neg]`` with ``neg != dst``."""
    c = jax.random.randint(
        rng, (dst.shape[0], num_neg), minval=0, maxval=num_nodes - 1,
        dtype=dst.dtype,
    )
    return c + (c >= dst[:, None]).astype(dst.dtype)
