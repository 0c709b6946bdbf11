"""Serving harness: a batching/queueing daemon around the deployed engines.

The reference has no serving story at all — its entry points are one-shot
batch scripts (scripts/txt2img.py, scripts/sample_diffusion_*.py). This
module adds production serving on top of the same deployed step functions
(deploy.make_quantized_step / pipelines), designed around XLA's
compilation model:

  * **Bucketed static shapes.** Everything under jit compiles per shape.
    Incoming requests are coalesced into the smallest configured batch
    bucket that fits (default 1/2/4/8), padding with repeats — so the
    server runs at most len(buckets) compiled programs, ever, instead of
    recompiling per request size.
  * **Microbatching.** A single worker thread drains the queue; it waits
    up to max_wait_ms for more work before dispatching a partial batch,
    trading a little latency for MXU utilization (diffusion sampling
    throughput scales near-linearly with batch on v5e until the
    compute-bound knee; docs/PERF_NOTES.md).
  * **Futures + backpressure.** submit() returns a Future; the queue is
    bounded and submit() raises when the server is saturated, so callers
    shed load explicitly rather than OOMing the host.
  * Observability: submitted/completed counters, batch-size histogram,
    padding waste, wall latency percentiles (stats()).

The compute path stays 100% JAX: the server only marshals numpy in/out of
a caller-supplied `generate_fn(seeds, cond) -> images` (see
make_generate_fn for the factory over a task preset + engine).
"""

from __future__ import annotations

import base64
import json
import logging
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Sequence

import numpy as np

logger = logging.getLogger("qdiffusion_tpu.serving")


@dataclass(frozen=True)
class Request:
    """One generation request: n images sharing one conditioning."""

    n: int = 1
    seed: int = 0
    prompt: Optional[str] = None
    negative_prompt: Optional[str] = None
    guidance_scale: Optional[float] = None


@dataclass
class ServerConfig:
    batch_buckets: Sequence[int] = (1, 2, 4, 8)
    max_wait_ms: float = 20.0
    max_queue: int = 256


@dataclass(eq=False)  # identity equality: items carry ndarrays
class _Item:
    seed: int
    cond_key: tuple
    cond: Optional[np.ndarray]
    scale: Optional[float]
    future: Future
    slot: int  # index into the request's result list
    request_size: int
    results: list
    pending: list  # single-element mutable counter shared per request
    t_submit: float = field(default_factory=time.perf_counter)


class DiffusionServer:
    """Microbatching server over a generate function.

    generate_fn(seeds: int64 (B,), cond: Optional[float (B, ...)],
    scale: Optional[float]) -> float images (B, H, W, C) in [0, 1]. It is
    called only with batch sizes from config.batch_buckets (padded by
    repeating the tail item; padded outputs are discarded). cond is None
    when every item in the batch is unconditional; items are only batched
    together when their conditioning shape AND guidance scale match
    (cond_key) — a distinct scale is a distinct compiled program, so the
    set of scales in flight should stay small.
    """

    def __init__(self, generate_fn: Callable, config: ServerConfig = None,
                 encode_cond: Optional[Callable] = None):
        self.generate_fn = generate_fn
        self.config = config or ServerConfig()
        self.encode_cond = encode_cond
        self._buckets = sorted(set(int(b) for b in self.config.batch_buckets))
        if not self._buckets or self._buckets[0] < 1:
            raise ValueError(f"bad batch_buckets {self.config.batch_buckets}")
        self._queue: List[_Item] = []
        self._lock = threading.Lock()
        self._work = threading.Condition(self._lock)
        self._closed = False
        self._stats = {
            "submitted": 0, "completed": 0, "failed": 0, "batches": 0,
            "items_padded": 0, "batch_hist": {str(b): 0 for b in self._buckets},
        }
        self._latencies: List[float] = []
        self._worker = threading.Thread(target=self._run, name="qdt-serve",
                                        daemon=True)
        self._worker.start()

    # ---------------------------------------------------------------- API

    def submit(self, req: Request) -> Future:
        """Enqueue a request; the Future resolves to a list of n uint8
        (H, W, C) images. Raises RuntimeError on overload or shutdown."""
        if req.n < 1:
            raise ValueError("n must be >= 1")
        cond = None
        if self.encode_cond is not None:
            cond = self.encode_cond(req)  # may be None for uncond tasks
        # guidance_scale is part of the key even when cond is None: scale is
        # unused by uncond engines today, but coalescing different-scale
        # requests into one batch (executed with batch[0].scale) would be a
        # silent correctness trap the day an uncond engine consumes it.
        scale_key = ("" if req.guidance_scale is None
                     else float(req.guidance_scale),)
        cond_key = ((() if cond is None else tuple(np.asarray(cond).shape))
                    + scale_key)
        fut: Future = Future()
        results = [None] * req.n
        pending = [req.n]
        with self._lock:
            if self._closed:
                raise RuntimeError("server is shut down")
            if len(self._queue) + req.n > self.config.max_queue:
                raise RuntimeError(
                    f"queue full ({len(self._queue)}/{self.config.max_queue})")
            for i in range(req.n):
                self._queue.append(_Item(
                    seed=req.seed + i, cond_key=cond_key, cond=cond,
                    scale=req.guidance_scale, future=fut, slot=i,
                    request_size=req.n, results=results, pending=pending))
            self._stats["submitted"] += req.n
            self._work.notify()
        return fut

    def generate(self, req: Request, timeout: Optional[float] = None):
        """Synchronous convenience wrapper."""
        return self.submit(req).result(timeout=timeout)

    def stats(self) -> dict:
        with self._lock:
            out = dict(self._stats)
            out["queue_depth"] = len(self._queue)
            lat = sorted(self._latencies)
        if lat:
            out["latency_p50_ms"] = round(lat[len(lat) // 2] * 1e3, 2)
            out["latency_p95_ms"] = round(
                lat[min(len(lat) - 1, int(len(lat) * 0.95))] * 1e3, 2)
        return out

    def close(self, timeout: float = 30.0):
        with self._lock:
            self._closed = True
            self._work.notify_all()
        self._worker.join(timeout=timeout)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ------------------------------------------------------------- worker

    def _take_batch(self) -> Optional[List[_Item]]:
        """Blocks until work or shutdown; returns a same-cond_key batch of
        at most max(buckets) items, waiting up to max_wait_ms to fill the
        largest bucket that already has a head-of-line item."""
        deadline = None
        with self._work:
            while True:
                if self._queue:
                    if deadline is None:
                        deadline = (time.perf_counter()
                                    + self.config.max_wait_ms / 1e3)
                    key = self._queue[0].cond_key
                    same = [it for it in self._queue if it.cond_key == key]
                    if (len(same) >= self._buckets[-1]
                            or time.perf_counter() >= deadline
                            or self._closed):
                        batch = same[: self._buckets[-1]]
                        ids = set(id(it) for it in batch)
                        self._queue = [it for it in self._queue
                                       if id(it) not in ids]
                        return batch
                    self._work.wait(timeout=max(
                        0.0, deadline - time.perf_counter()))
                elif self._closed:
                    return None
                else:
                    deadline = None
                    self._work.wait()

    def _run(self):
        while True:
            batch = self._take_batch()
            if batch is None:
                return
            bucket = next(b for b in self._buckets if b >= len(batch))
            n_pad = bucket - len(batch)
            seeds = np.asarray([it.seed for it in batch]
                               + [batch[-1].seed] * n_pad, np.int64)
            cond = None
            if batch[0].cond is not None:
                cond = np.stack([np.asarray(it.cond) for it in batch]
                                + [np.asarray(batch[-1].cond)] * n_pad)
            t0 = time.perf_counter()
            try:
                images = np.asarray(
                    self.generate_fn(seeds, cond, batch[0].scale))
            except Exception as exc:  # resolve futures, don't kill worker
                logger.exception("generate_fn failed")
                with self._lock:
                    self._stats["failed"] += len(batch)
                for it in batch:
                    if not it.future.done():
                        it.future.set_exception(exc)
                continue
            dt = time.perf_counter() - t0
            if images.dtype != np.uint8:
                images = (np.clip(images, 0.0, 1.0) * 255.0).astype(np.uint8)
            now = time.perf_counter()
            with self._lock:
                self._stats["batches"] += 1
                self._stats["items_padded"] += n_pad
                self._stats["batch_hist"][str(bucket)] += 1
                self._stats["completed"] += len(batch)
                self._latencies.extend(
                    now - it.t_submit for it in batch)
                if len(self._latencies) > 4096:
                    self._latencies = self._latencies[-2048:]
            logger.info("batch %d(+%d pad) in %.1f ms", len(batch), n_pad,
                        dt * 1e3)
            for i, it in enumerate(batch):
                it.results[it.slot] = images[i]
                it.pending[0] -= 1
                if it.pending[0] == 0 and not it.future.done():
                    it.future.set_result(it.results)


# ---------------------------------------------------------------- factory


def make_generate_fn(task, params, vae_params=None, *, pipe=None, model=None,
                     qstate=None, mode=None, model_fn=None,
                     sampler: Optional[str] = None,
                     steps: Optional[int] = None,
                     guidance_scale: Optional[float] = None,
                     uncond=None, mesh=None, param_specs=None):
    """generate_fn over a task preset + deployed engine, for DiffusionServer.

    Each item's initial noise is drawn from its own seed, so a given
    (seed, cond) yields the same image regardless of which batch it landed
    in — for the deterministic samplers (ddim eta=0, plms, dpm_solver).
    Conditioning (if any) arrives batched from the server.

    The whole request computation is ONE jitted program per (bucket,
    scale), with the param/vae/qstate trees threaded as jit arguments (not
    closures): without this, every request re-traces the sampler scan on
    the host — measured 20 s/request vs ~1 s of device time on the remote
    tunnel. Engines that supply a pre-jitted `model_fn` closure (int8 /
    stream) cannot be re-jitted from outside, so they keep the eager path;
    `fold` (the serving default) and `sim` take the jitted one."""
    import jax
    import jax.numpy as jnp

    steps = steps or task.sampler.timesteps
    samp = sampler or task.sampler.sample_type
    if task.family == "pixel":
        shape = (task.image_size, task.image_size, task.channels)
    else:
        shape = (task.latent_size, task.latent_size, task.latent_channels)

    def _init_noise(seeds):
        keys = jax.vmap(jax.random.PRNGKey)(seeds.astype(jnp.uint32))
        return jax.vmap(lambda k: jax.random.normal(k, shape))(keys)

    # bf16-cast param trees get the bf16 evaluation carrier: the samplers'
    # f32 step tables otherwise promote the scan carry, so every UNet call
    # after step 1 (and the VAE decode) would run f32 activations against
    # bf16 params at half MXU rate. Quantized engines (model_fn closures)
    # manage their own carriers — skip the cast there; sim/fold with f32
    # params keep the single-dtype reference-parity flow.
    p_leaves = jax.tree_util.tree_leaves(params)
    eval_dtype = jnp.bfloat16 if model_fn is None and p_leaves and all(
        leaf.dtype == jnp.bfloat16 for leaf in p_leaves
        if jnp.issubdtype(leaf.dtype, jnp.floating)) else None

    def _run(params, vae_params, qstate, seeds, cond, uncond_row, n, scale):
        # n/scale are trailing POSITIONAL statics: pjit rejects kwargs
        # when in_shardings is specified (the mesh path)
        x0 = _init_noise(jnp.asarray(seeds))
        key = jax.random.PRNGKey(0)  # only used by stochastic samplers
        if task.family == "pixel":
            x, _ = pipe.sample(
                params, n, timesteps=steps,
                skip_type=task.sampler.skip_type, eta=task.sampler.eta,
                sample_type=samp, image_size=task.image_size,
                channels=task.channels, rng=key, x_init=x0,
                qstate=qstate, mode=mode, model_fn=model_fn,
                eval_dtype=eval_dtype)
            return jnp.clip((x.astype(jnp.float32) + 1.0) / 2.0, 0.0, 1.0)
        uncond_n = None
        if cond is not None and uncond_row is not None:
            uncond_n = jnp.broadcast_to(uncond_row,
                                        (n,) + uncond_row.shape[-2:])
        imgs, _ = pipe.sample(
            params, vae_params, n, sampler=samp, steps=steps,
            eta=task.sampler.eta, latent_size=task.latent_size,
            latent_channels=task.latent_channels, rng=key, x_init=x0,
            cond=cond, uncond=uncond_n, guidance_scale=scale,
            qstate=qstate, mode=mode, model_fn=model_fn,
            eval_dtype=eval_dtype)
        return imgs

    if model_fn is not None:
        run = _run  # pre-jitted engine closure; cannot re-jit from outside
    elif mesh is not None:
        # mesh generate: batch dim of seeds/cond/output sharded over the
        # data axes — the scan-sampler runs SPMD with zero collectives
        # (batch n must divide the data-axes size). If the mesh has a
        # "model" axis, params are tensor-parallel-sharded megatron-style
        # (parallel/tp.py) and XLA inserts the per-layer psums over it;
        # qstate/vae stay replicated.
        from jax.sharding import NamedSharding, PartitionSpec as P

        from qdiffusion_tpu.parallel.tp import (
            MODEL_AXIS, tp_param_specs, tp_sharding_tree)

        repl = NamedSharding(mesh, P())
        batch_axes = tuple(a for a in mesh.axis_names if a != MODEL_AXIS)
        data = NamedSharding(mesh, P(batch_axes))
        p_sh = repl
        if MODEL_AXIS in mesh.axis_names:
            if param_specs is None and hasattr(model, "_plans"):
                param_specs = tp_param_specs(
                    model, params, mesh.shape[MODEL_AXIS])
            if param_specs is not None:
                p_sh = tp_sharding_tree(mesh, param_specs)
        run = jax.jit(_run, static_argnums=(6, 7),
                      in_shardings=(p_sh, repl, repl, data, data, repl),
                      out_shardings=data)
    else:
        run = jax.jit(_run, static_argnums=(6, 7))

    def generate(seeds, cond=None, scale=None):
        if scale is None:
            scale = float(guidance_scale if guidance_scale is not None
                          else task.sampler.guidance_scale)
        return run(params, vae_params, qstate, jnp.asarray(seeds),
                   None if cond is None else jnp.asarray(cond), uncond,
                   len(seeds), float(scale))

    return generate


# ------------------------------------------------------------------ HTTP


def serve_http(server: DiffusionServer, host: str = "127.0.0.1",
               port: int = 8470, *, poll_ready=None):
    """Minimal JSON-over-HTTP front-end (stdlib only; no new deps).

    POST /generate  {"n": 1, "seed": 0, "prompt": "...", "scale": 7.5}
        -> {"images": [<base64 PNG>...], "latency_ms": ...}
    GET  /stats     -> server.stats()
    GET  /healthz   -> ok

    Returns the ThreadingHTTPServer (caller calls serve_forever /
    shutdown); binds immediately so tests can grab the ephemeral port."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    def to_png(img: np.ndarray) -> bytes:
        from qdiffusion_tpu.utils.run_logging import encode_png

        return encode_png(img)

    class Handler(BaseHTTPRequestHandler):
        def _json(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True})
            elif self.path == "/stats":
                self._json(200, server.stats())
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/generate":
                self._json(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length) or b"{}")
                req = Request(
                    n=int(payload.get("n", 1)),
                    seed=int(payload.get("seed", 0)),
                    prompt=payload.get("prompt"),
                    negative_prompt=payload.get("negative_prompt"),
                    guidance_scale=payload.get("scale"))
                t0 = time.perf_counter()
                images = server.generate(req, timeout=600.0)
                out = [base64.b64encode(to_png(im)).decode()
                       for im in images]
                self._json(200, {
                    "images": out,
                    "latency_ms": round(
                        (time.perf_counter() - t0) * 1e3, 1)})
            except RuntimeError as exc:  # overload / shutdown
                self._json(503, {"error": str(exc)})
            except Exception as exc:
                logger.exception("request failed")
                self._json(500, {"error": str(exc)})

        def log_message(self, fmt, *args):
            logger.debug("http: " + fmt, *args)

    httpd = ThreadingHTTPServer((host, port), Handler)
    logger.info("serving on http://%s:%d", *httpd.server_address)
    return httpd
