"""Inference engine with continuous batching.

The serving path the reference lacks entirely (SURVEY.md §2.2 / BASELINE
north star: "continuous batching of inference requests across hosts").

Design: requests (single images) enter a queue; a scheduler thread drains
up to `max_batch` requests (waiting at most `max_wait_ms` once one is
pending), pads the batch to a fixed compiled size — static shapes keep a
single XLA executable hot — runs the packed eval forward, and resolves
each request's Future with its logits. Padding rows are masked out before
resolution. Multiple fixed batch buckets avoid paying full-batch latency
for single stragglers.

Scale-out note: one engine binds one process/host; multi-host serving runs
one engine per host behind an external load balancer, with model variables
loaded from the same checkpoint (the TP-sharded variant jits the forward
over a mesh instead — same API).
"""

import collections
import logging
import queue
import threading
import time
from concurrent.futures import Future
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

# Ring-buffer depth for latency percentiles: recent-window stats, O(1) mem.
_LATENCY_WINDOW = 2048


class InferenceEngine:
    def __init__(self, apply_fn: Callable, variables: dict,
                 input_shape: Sequence[int],
                 max_batch: int = 64,
                 batch_buckets: Optional[Sequence[int]] = None,
                 max_wait_ms: float = 2.0,
                 input_sharding: Optional[jax.sharding.Sharding] = None):
        """
        Args:
            apply_fn: model.apply of an eval-ready (e.g. packed) model;
                called as apply_fn(variables, x, False).
            variables: trained model variables (with quant_state caches).
                May be pre-placed with mesh shardings (TP out-channel
                shards, spatial-replicated) — the jit keeps them.
            input_shape: per-example shape, e.g. (224, 224, 3).
            max_batch: largest compiled batch size.
            batch_buckets: ascending compiled batch sizes (default
                powers-of-two up to max_batch).
            max_wait_ms: batching window after the first pending request.
            input_sharding: optional sharding for the batched input,
                e.g. `spatial_sharding(mesh)` to band the image height
                across devices (parallel/spatial.py) — the low-latency /
                large-image serving axis; GSPMD inserts the halo
                exchanges.
        """
        self.apply_fn = apply_fn
        self.variables = variables
        self.input_sharding = input_sharding
        self.input_shape = tuple(input_shape)
        self.max_batch = max_batch
        # max_batch is always a bucket so _bucket_for(n) can hold any
        # batch the scheduler collects (n <= max_batch by construction).
        self.buckets = sorted(set(
            (batch_buckets or [b for b in (1, 2, 4, 8, 16, 32, 64, 128, 256)
                               if b <= max_batch])) | {max_batch})
        self.max_wait = max_wait_ms / 1000.0
        self._queue: queue.Queue = queue.Queue()
        self._compiled = {}
        # One lock guards compile-cache population (two threads racing
        # into jit would double-compile) and the stats counters.
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._stats = {'requests': 0, 'batches': 0, 'padded': 0}
        # Request latency (submit -> result set) over a recent window.
        self._latencies: collections.deque = collections.deque(
            maxlen=_LATENCY_WINDOW)

    # -- public API ------------------------------------------------------

    def start(self) -> 'InferenceEngine':
        self._thread.start()
        return self

    def warmup(self, buckets: Optional[Sequence[int]] = None) -> None:
        """Compile (and run once) the given buckets — all by default — so
        no request ever pays XLA compile latency. Call before start() in
        deployments where first-request latency matters."""
        for b in (buckets or self.buckets):
            if b not in self.buckets:
                raise ValueError(f'{b} is not a configured bucket '
                                 f'({self.buckets})')
            self._run(b, np.zeros((b,) + self.input_shape, np.float32))

    def stop(self) -> None:
        self._stop.set()
        self._thread.join(timeout=10)

    def submit(self, image: np.ndarray) -> Future:
        """Enqueue one image; returns a Future resolving to its logits."""
        if tuple(image.shape) != self.input_shape:
            raise ValueError(
                f'expected shape {self.input_shape}, got {image.shape}')
        fut: Future = Future()
        self._queue.put((np.asarray(image, np.float32), fut,
                         time.perf_counter()))
        with self._lock:
            self._stats['requests'] += 1
        return fut

    def predict(self, images: np.ndarray) -> np.ndarray:
        """Synchronous batch prediction (bypasses the queue); inputs
        larger than max_batch are chunked."""
        outs = []
        for start in range(0, images.shape[0], self.max_batch):
            chunk = images[start:start + self.max_batch]
            n = chunk.shape[0]
            bucket = self._bucket_for(n)
            padded = np.zeros((bucket,) + self.input_shape, np.float32)
            padded[:n] = chunk
            outs.append(np.asarray(self._run(bucket, padded))[:n])
        return np.concatenate(outs) if outs else np.empty((0,))

    @property
    def load(self) -> int:
        """Pending request count (least-loaded dispatch key)."""
        return self._queue.qsize()

    def ping(self) -> bool:
        """Liveness probe (frontend health checks): an in-process engine
        is live iff its scheduler thread is running."""
        return self._thread.is_alive() and not self._stop.is_set()

    def latency_window(self) -> np.ndarray:
        """Recent request latencies in seconds (for aggregation)."""
        with self._lock:
            return np.asarray(self._latencies)

    @property
    def stats(self) -> dict:
        with self._lock:
            out = dict(self._stats)
            lats = np.asarray(self._latencies)
        if lats.size:
            out['latency_ms'] = {
                'p50': float(np.percentile(lats, 50) * 1e3),
                'p99': float(np.percentile(lats, 99) * 1e3),
                'max': float(lats.max() * 1e3),
                'window': int(lats.size),
            }
        return out

    # -- internals -------------------------------------------------------

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def _run(self, bucket: int, batch: np.ndarray) -> np.ndarray:
        with self._lock:
            fn = self._compiled.get(bucket)
            if fn is None:
                kwargs = ({'in_shardings': (None, self.input_sharding)}
                          if self.input_sharding is not None else {})
                fn = jax.jit(lambda v, x: self.apply_fn(v, x, False),
                             **kwargs)
                self._compiled[bucket] = fn
        return jax.device_get(fn(self.variables, jnp.asarray(batch)))

    def _loop(self) -> None:
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.1)
            except queue.Empty:
                continue
            items = [first]
            deadline = time.perf_counter() + self.max_wait
            while len(items) < self.max_batch:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    items.append(self._queue.get(timeout=remaining))
                except queue.Empty:
                    break

            n = len(items)
            bucket = self._bucket_for(n)
            batch = np.zeros((bucket,) + self.input_shape, np.float32)
            for i, (img, _, _) in enumerate(items):
                batch[i] = img
            try:
                out = self._run(bucket, batch)
            except Exception as e:  # resolve futures with the error
                for _, fut, _ in items:
                    fut.set_exception(e)
                continue
            done = time.perf_counter()
            for i, (_, fut, _) in enumerate(items):
                fut.set_result(np.asarray(out[i]))
            with self._lock:
                self._stats['batches'] += 1
                self._stats['padded'] += bucket - n
                self._latencies.extend(done - t0 for _, _, t0 in items)


class ServingFrontend:
    """Load balancer over multiple serving backends (the cross-host
    serving contract).

    A backend is anything with the engine surface — submit(image) ->
    Future, load (pending count), stats, latency_window() — i.e. a local
    `InferenceEngine` (colocated frontend) or a `RemoteEngineClient`
    (serving/rpc.py) fronting an engine in ANOTHER PROCESS/host over the
    socket RPC. All backends must serve identical variables (checkpoint
    hash verification is the deployer's responsibility). Contract:
      * `submit` routes to the least-loaded backend (pending-request
        count, ties broken round-robin) — continuous batching then
        happens independently inside each engine;
      * a backend raising on a batch fails only its own futures; the
        frontend keeps dispatching to the remaining engines;
      * health: `max_failures` CONSECUTIVE failed requests (observed via
        each future's outcome) evict a backend from dispatch; a daemon
        thread re-pings evicted backends every `reprobe_interval`
        seconds and re-admits them when they answer — so a crashed
        worker's restart rejoins automatically and a drained-to-zero
        dead backend can never become the most-preferred target;
      * `stats` aggregates request/batch counts AND the latency
        percentiles over the union of the backends' recent windows.
    """

    def __init__(self, engines: Sequence, max_failures: int = 2,
                 reprobe_interval: float = 0.5):
        if not engines:
            raise ValueError('ServingFrontend needs at least one engine')
        self.engines = list(engines)
        self._rr = 0
        self._lock = threading.Lock()
        self._alive = [True] * len(self.engines)
        self._fails = [0] * len(self.engines)
        self._max_failures = max_failures
        self._reprobe_interval = reprobe_interval
        self._health_stop = threading.Event()
        self._health_thread: Optional[threading.Thread] = None

    def start(self) -> 'ServingFrontend':
        for e in self.engines:
            e.start()
        self._health_thread = threading.Thread(
            target=self._health_loop, daemon=True)
        self._health_thread.start()
        return self

    def stop(self) -> None:
        self._health_stop.set()
        if self._health_thread is not None:
            self._health_thread.join(timeout=5)
        for e in self.engines:
            e.stop()

    # -- health ----------------------------------------------------------

    def _ping(self, engine: object) -> bool:
        probe = getattr(engine, 'ping', None)
        if probe is None:
            return True  # no probe surface — assume live
        try:
            return bool(probe())
        except Exception:  # noqa: BLE001 — liveness is boolean
            return False

    def _health_loop(self) -> None:
        while not self._health_stop.wait(self._reprobe_interval):
            self._reprobe_dead()

    def _reprobe_dead(self) -> None:
        with self._lock:
            dead = [i for i, a in enumerate(self._alive) if not a]
        for i in dead:
            if self._ping(self.engines[i]):
                with self._lock:
                    self._alive[i] = True
                    self._fails[i] = 0
                logger.info('serving frontend: backend %d rejoined', i)

    def _record_outcome(self, idx: int, ok: bool) -> None:
        with self._lock:
            if ok:
                self._fails[idx] = 0
                return
            self._fails[idx] += 1
            if self._fails[idx] >= self._max_failures and self._alive[idx]:
                self._alive[idx] = False
                logger.warning(
                    'serving frontend: backend %d evicted after %d '
                    'consecutive failures', idx, self._fails[idx])

    @property
    def alive(self) -> list[bool]:
        with self._lock:
            return list(self._alive)

    # -- dispatch --------------------------------------------------------

    def _pick(self) -> int:
        with self._lock:
            candidates = [i for i, a in enumerate(self._alive) if a]
        if not candidates:
            # Every backend evicted: synchronously re-probe before
            # giving up — a restarted worker may be back already.
            self._reprobe_dead()
            with self._lock:
                candidates = [i for i, a in enumerate(self._alive) if a]
            if not candidates:
                raise RuntimeError('serving frontend: no live backends')
        with self._lock:
            loads = {i: self.engines[i].load for i in candidates}
            lo = min(loads.values())
            n = len(self.engines)
            for off in range(n):
                i = (self._rr + off) % n
                if loads.get(i) == lo:
                    self._rr = (i + 1) % n
                    return i
            return candidates[0]  # unreachable

    # Exceptions that indicate the BACKEND is unreachable/broken (a
    # health event) vs request-level failures a backend REPORTED while
    # alive (e.g. a remote engine's shape ValueError comes back over
    # the RPC as RuntimeError — evicting a healthy backend for a
    # malformed request would let bad clients take the fleet down).
    _TRANSPORT_ERRORS = (ConnectionError, OSError, EOFError,
                         TimeoutError)

    def _record_from_future(self, idx: int, fut: Future) -> None:
        exc = fut.exception()
        if exc is None:
            self._record_outcome(idx, ok=True)
        elif isinstance(exc, self._TRANSPORT_ERRORS):
            self._record_outcome(idx, ok=False)
        # else: the backend answered (with an error) — alive; the
        # caller sees the failure through the future either way.

    def submit(self, image: np.ndarray) -> Future:
        last_exc: Optional[Exception] = None
        for _ in range(len(self.engines)):
            idx = self._pick()
            try:
                fut = self.engines[idx].submit(image)
            except self._TRANSPORT_ERRORS as e:
                self._record_outcome(idx, ok=False)
                last_exc = e
                continue
            fut.add_done_callback(
                lambda f, i=idx: self._record_from_future(i, f))
            return fut
        raise RuntimeError(
            f'serving frontend: submit failed on every backend '
            f'(last: {last_exc})')

    def predict(self, images: np.ndarray) -> np.ndarray:
        """Synchronous convenience: scatter rows over backends via
        submit() and gather in order."""
        futs = [self.submit(img) for img in images]
        return np.stack([f.result(timeout=60) for f in futs])

    @property
    def stats(self) -> dict:
        # A dead backend must not take down the monitoring surface:
        # dispatch keeps working through the healthy engines, and stats
        # reports the failure inline instead of raising.
        per = []
        for e in self.engines:
            try:
                per.append(e.stats)
            except Exception as err:  # noqa: BLE001 — report, don't die
                per.append({'requests': 0, 'batches': 0,
                            'error': f'{type(err).__name__}: {err}'})
        out = {'engines': per,
               'alive': self.alive,
               'requests': sum(s['requests'] for s in per),
               'batches': sum(s['batches'] for s in per)}
        windows = []
        for e in self.engines:
            try:
                w = e.latency_window()
            except Exception:  # noqa: BLE001
                continue
            if w.size:
                windows.append(w)
        if windows:
            lats = np.concatenate(windows)
            out['latency_ms'] = {
                'p50': float(np.percentile(lats, 50) * 1e3),
                'p99': float(np.percentile(lats, 99) * 1e3),
                'max': float(lats.max() * 1e3),
                'window': int(lats.size),
            }
        return out
