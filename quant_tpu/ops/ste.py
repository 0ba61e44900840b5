"""Straight-through-estimator sign function.

Behavioral parity with the reference STE (quant/binary/ste.py:16-70 in
apple/ml-quant): forward is sign(x) with sign(0) = +1; backward passes the
incoming cotangent through unchanged except where |x| > 1, where it is
zeroed (the "clipped" straight-through estimator of Bengio et al. 2013).

TPU-first design notes: implemented as a `jax.custom_vjp` over pure jnp
ops so it fuses into surrounding XLA computations; there is no separate
"autograd Function" object and no saved-tensor bookkeeping — the residual
is just the boolean pass-through mask.
"""

import jax
import jax.numpy as jnp


def binary_sign(x: jax.Array) -> jax.Array:
    """Return -1.0 where x < 0 and +1.0 where x >= 0 (note: sign(0) = +1)."""
    return jnp.where(x < 0, -1.0, 1.0).astype(x.dtype)


@jax.custom_vjp
def binarize(x: jax.Array) -> jax.Array:
    """Binarize x to {-1, +1} with a straight-through gradient.

    Forward: `binary_sign(x)`. Backward: identity on the cotangent inside
    [-1, 1], zero outside (reference: quant/binary/ste.py:51-66).
    """
    return binary_sign(x)


def _binarize_fwd(x: jax.Array) -> tuple:
    # Residual: the pass-through mask. The reference zeroes gradient where
    # x > 1 or x < -1, i.e. passes it through on the closed interval [-1, 1].
    return binary_sign(x), (jnp.abs(x) <= 1.0)


def _binarize_bwd(mask: jax.Array, g: jax.Array) -> tuple:
    return (jnp.where(mask, g, 0.0).astype(g.dtype),)


binarize.defvjp(_binarize_fwd, _binarize_bwd)
