"""Classification losses (reference initialization.py:27-47 get_loss_fn).

All losses take (output, target) where output is what the model emits
(raw logits for cross_entropy, log-probabilities for nll_loss/kl_div —
the LeNet family ends in log_softmax, matching the reference pairing of
lenet5 + nll_loss) and integer class targets, and return the batch mean.
"""

from typing import Callable

import jax
import jax.numpy as jnp


def cross_entropy(output: jax.Array, target: jax.Array) -> jax.Array:
    """Softmax cross entropy over raw logits (torch F.cross_entropy)."""
    logp = jax.nn.log_softmax(output, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, target[:, None], axis=-1))


def nll_loss(output: jax.Array, target: jax.Array) -> jax.Array:
    """Negative log likelihood over log-probabilities (torch F.nll_loss)."""
    return -jnp.mean(jnp.take_along_axis(output, target[:, None], axis=-1))


def kl_div(output: jax.Array, target_probs: jax.Array) -> jax.Array:
    """KL(target || output) with output in log space (torch F.kl_div,
    reduction='mean' over all elements, matching torch's default)."""
    elt = target_probs * (jnp.log(jnp.clip(target_probs, 1e-12)) - output)
    return jnp.mean(elt)


_LOSSES: dict[str, Callable] = {
    'cross_entropy': cross_entropy,
    'nll_loss': nll_loss,
    'kl_div': kl_div,
}


def get_loss_fn(loss: str) -> Callable:
    try:
        return _LOSSES[loss]
    except KeyError:
        raise ValueError(f'Loss function {loss} is not supported.')
