"""Shared measurement harness for the tools/ benches and probes.

One implementation of the DCE-proof throughput protocol (UNROLL
forwards chained through a one-element full-reduction carry inside a
single jit, donated buffer, one device_get — see bench.py's
measurement notes) and the JSONL recorder, so every A/B number in
tools/bench_ab_results.jsonl is produced by the SAME code path.
bench.py keeps its own self-contained copy (the driver runs it in
isolation at round end); this module is the tools-side single source.
"""

import functools
import json
import time

import jax
import jax.numpy as jnp

RESULTS = '/root/repo/tools/bench_ab_results.jsonl'
UNROLL = 4


def enable_compile_cache() -> None:
    try:
        jax.config.update('jax_compilation_cache_dir',
                          '/tmp/jax_comp_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          10)
    except Exception:  # pragma: no cover - older jax
        pass


def record(**kv: object) -> None:
    with open(RESULTS, 'a') as f:
        f.write(json.dumps(kv) + '\n')
    print(json.dumps(kv), flush=True)


def fill_quant_state(variables: dict) -> dict:
    """Warm-fill for bench variables: plausible cached scales (0.5 —
    values are epilogue multipliers, irrelevant to throughput) and a
    nonzero count for integer EMA trackers (the fold guards need
    tracked batches). One shared definition so every tool benches the
    same convention (bench.py keeps its own self-contained copy)."""
    v = dict(variables)
    v['quant_state'] = jax.tree.map(
        lambda t: (jnp.ones_like(t)
                   if jnp.issubdtype(t.dtype, jnp.integer)
                   else jnp.full_like(t, 0.5)),
        v.get('quant_state', {}))
    return v


def throughput(apply_fn, variables, x, iters: int,
               unroll: int = UNROLL) -> float:
    """Images/sec with iterations serialized by data dependency."""

    @functools.partial(jax.jit, donate_argnums=0)
    def step(t):
        for _ in range(unroll):
            out = apply_fn(variables, t, False)
            t = t.at[0, 0, 0, 0].add(
                (1e-12 * jnp.mean(out)).astype(t.dtype))
        return t

    y = step(jnp.array(x, copy=True))
    _ = jax.device_get(jnp.sum(y[0, 0, 0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        y = step(y)
    _ = jax.device_get(jnp.sum(y[0, 0, 0]))
    return x.shape[0] * unroll * iters / (time.perf_counter() - t0)
