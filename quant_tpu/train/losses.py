"""Classification losses (reference initialization.py:27-47 get_loss_fn).

All losses take (output, target) where output is what the model emits
(raw logits for cross_entropy, log-probabilities for nll_loss/kl_div —
the LeNet family ends in log_softmax, matching the reference pairing of
lenet5 + nll_loss) and integer class targets, and return the batch mean.
"""

from typing import Callable

import jax
import jax.numpy as jnp


def _cross_entropy_per_sample(output: jax.Array,
                              target: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(output, axis=-1)
    return -jnp.take_along_axis(logp, target[:, None], axis=-1)[:, 0]


def cross_entropy(output: jax.Array, target: jax.Array) -> jax.Array:
    """Softmax cross entropy over raw logits (torch F.cross_entropy)."""
    return jnp.mean(_cross_entropy_per_sample(output, target))


def _nll_per_sample(output: jax.Array, target: jax.Array) -> jax.Array:
    return -jnp.take_along_axis(output, target[:, None], axis=-1)[:, 0]


def nll_loss(output: jax.Array, target: jax.Array) -> jax.Array:
    """Negative log likelihood over log-probabilities (torch F.nll_loss)."""
    return jnp.mean(_nll_per_sample(output, target))


def _kl_per_sample(output: jax.Array,
                   target_probs: jax.Array) -> jax.Array:
    # Per-row mean over classes, so a masked mean over rows equals
    # torch's numel-mean restricted to the valid rows.
    elt = target_probs * (jnp.log(jnp.clip(target_probs, 1e-12)) - output)
    return jnp.mean(elt, axis=-1)


def kl_div(output: jax.Array, target_probs: jax.Array) -> jax.Array:
    """KL(target || output) with output in log space (torch F.kl_div,
    reduction='mean' over all elements, matching torch's default)."""
    elt = target_probs * (jnp.log(jnp.clip(target_probs, 1e-12)) - output)
    return jnp.mean(elt)


# Per-sample forms (shape (N,)) ride along as attributes: the masked
# eval path (multi-process full-test-set eval with padded rows) needs
# loss contributions per row to exclude the padding; custom losses
# without the attribute simply fall back to the unmasked path.
cross_entropy.per_sample = _cross_entropy_per_sample  # type: ignore
nll_loss.per_sample = _nll_per_sample  # type: ignore
kl_div.per_sample = _kl_per_sample  # type: ignore

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
