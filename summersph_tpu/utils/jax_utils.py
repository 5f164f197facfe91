"""Small JAX helpers shared across ops."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def row_blocks(n: int, block: int) -> jax.Array:
    """[nb, block] int32 row-index blocks covering range(n).

    n is padded up to a multiple of `block` by repeating the last index; the
    duplicated rows cost only wasted compute — callers slice outputs back to
    n rows with `unblock`.
    """
    nb = -(-n // block)
    idx = jnp.minimum(jnp.arange(nb * block, dtype=jnp.int32), n - 1)
    return idx.reshape(nb, block)


def unblock(x: jax.Array, n: int) -> jax.Array:
    """Undo row_blocks stacking: [nb, block, ...] -> [n, ...]."""
    return x.reshape((-1,) + x.shape[2:])[:n]


def pick_block(n: int, cols: int, budget: int = 1 << 22, lo: int = 8,
               hi: int = 1024) -> int:
    """Row-block size keeping block*cols pairwise intermediates ~budget elems."""
    b = max(lo, min(hi, budget // max(cols, 1)))
    # round down to a power of two for friendlier layouts
    p = 1
    while p * 2 <= b:
        p *= 2
    return min(p, max(1, n))


def masked_min(x, mask, fill=jnp.inf):
    return jnp.min(jnp.where(mask, x, fill))


def masked_max(x, mask, fill=-jnp.inf):
    return jnp.max(jnp.where(mask, x, fill))


__all__ = ["row_blocks", "unblock", "pick_block", "masked_min", "masked_max"]
