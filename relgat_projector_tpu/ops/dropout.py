"""Deterministic per-(edge, head) attention-dropout masks.

The reference drops normalized attention weights with torch's stateful RNG
(``core/model/layer.py:296-297``). A TPU-native fused kernel needs a mask
the hand-written BACKWARD can replay without materializing it: the forward
(dst-blocked) and backward (src-blocked) kernels walk the edges in
different orders, so the mask must be a pure function of the canonical edge
id — not of the kernel's iteration order.

This module is that function: an fmix32-style integer hash of
``(seed, edge_id, head)`` computed with plain int32 ops that lower
identically in XLA and Mosaic, so the XLA path, the fused forward, and the
fused backward all see bitwise-identical masks for the same seed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# fmix32 / splitmix constants as wrapped int32 literals.
_GOLD = -1640531527    # 0x9E3779B9
_MIX1 = -2048144789    # 0x85EBCA6B
_MIX2 = -1028477387    # 0xC2B2AE35
_MASK31 = 0x7FFFFFFF


def _fmix(x: jax.Array) -> jax.Array:
    x = x ^ jax.lax.shift_right_logical(x, 16)
    x = x * jnp.int32(_MIX1)
    x = x ^ jax.lax.shift_right_logical(x, 13)
    x = x * jnp.int32(_MIX2)
    x = x ^ jax.lax.shift_right_logical(x, 16)
    return x


def keep_threshold(rate: float) -> int:
    """31-bit keep threshold for a drop probability ``rate`` (static)."""
    return int((1.0 - float(rate)) * _MASK31)


def edge_keep_mask_all_heads(
    edge_ids: jax.Array,   # [E] int32
    heads: int,
    seed: jax.Array,       # int32 scalar
    rate: float,
) -> jax.Array:
    """``[E, H]`` float32 keep mask (XLA path)."""
    h_idx = jnp.arange(heads, dtype=jnp.int32)
    x = (
        edge_ids.astype(jnp.int32)[:, None] * jnp.int32(_GOLD)
        + jnp.int32(seed)
        + h_idx[None, :] * jnp.int32(_MIX2)
    )
    u = _fmix(x) & jnp.int32(_MASK31)
    return (u < jnp.int32(keep_threshold(rate))).astype(jnp.float32)


def seed_from_key(rng: jax.Array) -> jax.Array:
    """Derive the int32 hash seed from a JAX PRNG key."""
    data = jax.random.key_data(rng).reshape(-1).astype(jnp.uint32)
    return (data[0] ^ data[-1]).astype(jnp.int32)
