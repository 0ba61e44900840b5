"""Train state: one pytree threading all mutable quantities.

The functional replacement for the reference's {model, optimizer,
scheduler} triple of stateful objects: parameters, BN statistics, quantizer
scale caches, optimizer state, and the step counter all live in one
`flax.struct` pytree that the jitted train step maps to its successor.
The LR "scheduler" is just the optax schedule read at `step` (the
reference steps its scheduler per batch, training.py:119 — here the step
counter IS the schedule input).
"""

from typing import Any, Callable

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    quant_state: Any
    opt_state: Any
    apply_fn: Callable = flax.struct.field(pytree_node=False)
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    @property
    def model_variables(self) -> dict:
        v = {'params': self.params}
        if self.batch_stats:
            v['batch_stats'] = self.batch_stats
        if self.quant_state:
            v['quant_state'] = self.quant_state
        return v

    @classmethod
    def create(cls, apply_fn: Callable, variables: dict,
               tx: optax.GradientTransformation) -> 'TrainState':
        import jax.numpy as jnp
        params = variables.get('params', {})
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get('batch_stats', {}),
            quant_state=variables.get('quant_state', {}),
            opt_state=tx.init(params),
            apply_fn=apply_fn,
            tx=tx,
        )
