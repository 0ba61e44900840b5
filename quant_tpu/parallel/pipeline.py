"""Pipeline parallelism: GPipe-microbatched stage sharding over a mesh axis.

The reference has no pipeline parallelism (SURVEY.md §2.2 — single-process
nn.DataParallel only); this is the TPU-native extension for models whose
depth exceeds one chip. Idiomatic form: per-stage parameters are stacked
along a leading axis and sharded over a 'pipe' mesh axis, activations flow
stage-to-stage via `lax.ppermute` (one ICI hop per schedule tick), and the
whole schedule is a `lax.scan` inside one `shard_map` — a single compiled
SPMD program, no host round-trips between ticks.

Schedule: plain GPipe. With S stages and M microbatches the scan runs
``M + S - 1`` ticks; device d is busy on ticks ``[d, d + M)``; pipeline
utilization is ``M / (M + S - 1)`` (drive M >= 4*S to amortize the bubble).
The ppermute send of tick t overlaps the stage compute of tick t+1 —
XLA schedules the DMA concurrently with the MXU work, the same
collective/compute-overlap pattern as tp_overlap.py's ring GEMM.

Stage homogeneity contract: every stage maps activations of one fixed
shape/dtype to the same shape/dtype, and per-stage params share one pytree
structure (stacked along axis 0). CNN trunks satisfy this within a
resolution group — QResNet's layerN blocks (resnet.py:56-223) are exactly
such homogeneous towers; stage boundaries with resolution changes belong
inside a stage, not between stages.

The whole schedule is differentiable: `ppermute`/`scan` have transposes,
so `jax.grad` through `pipeline_apply` yields the reverse pipeline
automatically — backward microbatches flow last-stage-to-first with the
same bubble.
"""

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

StageFn = Callable[[Any, jax.Array], jax.Array]


def stage_sharding(mesh: Mesh, axis: str = 'pipe') -> NamedSharding:
    """Sharding for stage-stacked params: leading axis split over `axis`."""
    return NamedSharding(mesh, P(axis))


def stack_stage_params(per_stage: list) -> Any:
    """Stack S per-stage param pytrees along a new leading axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_stage)


def pipeline_apply(stage_fn: StageFn, stage_params: Any,
                   microbatches: jax.Array, *, mesh: Mesh,
                   axis: str = 'pipe',
                   batch_axis: Optional[str] = None) -> jax.Array:
    """Run microbatches through a stage-sharded pipeline.

    Args:
        stage_fn: ``(params_for_one_stage, x) -> y`` with ``y.shape ==
            x.shape`` and same dtype (homogeneity contract above).
        stage_params: pytree whose leaves have leading dim S (one slice
            per stage), sharded over `axis` (see `stage_sharding`).
        microbatches: (M, mb, ...) stacked microbatch inputs. With
            `batch_axis` the mb dim shards over that mesh axis (true
            dp x pp composition: each data row pipelines its own rows);
            otherwise replicated.
        mesh: mesh containing `axis` of size S.

    Returns:
        (M, mb, ...) outputs after all S stages, replicated over `axis`
        (and mb-sharded over `batch_axis` when given).
    """
    s = mesh.shape[axis]
    m = microbatches.shape[0]
    leading = {leaf.shape[0] if leaf.ndim else None
               for leaf in jax.tree.leaves(stage_params)}
    if leading != {s}:
        raise ValueError(
            f'stage_params leaves must all have leading dim {s} '
            f'(= mesh.shape[{axis!r}], one slice per stage); got leading '
            f'dims {sorted(leading, key=str)}. A leading dim of k*{s} would '
            'silently give each device k stages and drop all but the first.')
    if m < 1:
        raise ValueError('microbatches must have leading dim M >= 1')
    ticks = m + s - 1
    mb_spec = P(None, batch_axis)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axis), mb_spec), out_specs=mb_spec)
    def schedule(params_loc, mb_all):
        # params_loc: leading dim 1 (this device's stage) -> squeeze.
        params = jax.tree.map(lambda v: v[0], params_loc)
        d = lax.axis_index(axis)
        zero = jnp.zeros_like(mb_all[0])

        def tick(carry, t):
            incoming, outbuf = carry
            # Stage 0 ingests microbatch t while it exists; during the
            # S-1 drain ticks it chews zeros instead. (SPMD scans run
            # every stage every tick, so drain-tick compute on stage 0
            # happens regardless and is discarded by construction —
            # zeros just make the discard explicit.)
            feed = jnp.where(t < m, mb_all[jnp.minimum(t, m - 1)], zero)
            x = jnp.where(d == 0, feed, incoming)
            y = stage_fn(params, x)
            # Last stage banks its finished microbatch (index t-(S-1)).
            out_idx = t - (s - 1)
            bank = jnp.logical_and(d == s - 1, out_idx >= 0)
            outbuf = lax.dynamic_update_index_in_dim(
                outbuf,
                jnp.where(bank, y, outbuf[jnp.maximum(out_idx, 0)]),
                jnp.maximum(out_idx, 0), axis=0)
            # One ICI hop downstream; non-cyclic: stage 0 receives zeros.
            passed = lax.ppermute(y, axis,
                                  [(j, j + 1) for j in range(s - 1)])
            return (passed, outbuf), None

        outbuf0 = jnp.zeros((m,) + mb_all.shape[1:], mb_all.dtype)
        # The carry is device-varying over the pipe axis (each stage
        # holds different activations) and, when the mb dim is sharded,
        # over the batch axis too. `zero` already inherits the batch
        # varying-ness from mb_all; the fresh outbuf zeros inherit none.
        vary = (axis,) + ((batch_axis,) if batch_axis else ())
        carry0 = (lax.pcast(zero, (axis,), to='varying'),
                  lax.pcast(outbuf0, vary, to='varying'))
        (_, outbuf), _ = lax.scan(tick, carry0, jnp.arange(ticks))
        # Only the last stage holds real outputs; psum replicates them
        # (every other contribution is the zero buffer).
        keep = jnp.where(d == s - 1, outbuf, jnp.zeros_like(outbuf))
        return lax.psum(keep, axis)

    return schedule(stage_params, microbatches)


