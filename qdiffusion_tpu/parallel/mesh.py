"""Device-mesh data parallelism for sampling and calibration.

The reference has no working multi-device path (its `multi_gpu` flag raises
NotImplementedError with dead linklink allreduce calls,
qdiff/block_recon.py:147-150). Here data parallelism is native:

  * FID sampling shards the image batch over a 1-axis `data` mesh; the
    whole lax.scan sampler runs SPMD with zero collectives (embarrassingly
    parallel), XLA partitions automatically from the input sharding.
  * Calibration gradients are mean-reduced over the sharded batch — the
    jnp.mean over batch inside the loss IS the psum; XLA inserts the
    collective over ICI. This implements the allreduce the reference left
    as a TODO.

Multi-host extension: the same code runs over a DCN-connected multi-host
mesh via jax.distributed initialization; shardings are expressed once.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jnp.ndarray

DATA_AXIS = "data"


DCN_AXIS = "dcn"


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def distributed_init(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (idempotent). With no arguments, relies on the
    cluster environment (TPU pods auto-detect; GKE/SLURM via env vars) —
    the standard jax.distributed.initialize() contract. Call before any
    device query on every process of a multi-host job."""
    if getattr(distributed_init, "_done", False):
        return
    kw = {}
    if coordinator_address is not None:
        kw = dict(coordinator_address=coordinator_address,
                  num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kw)
    except (ValueError, RuntimeError) as e:  # single-process / already up
        import logging

        logging.getLogger(__name__).info(
            "jax.distributed.initialize skipped: %s", e)
    distributed_init._done = True


def make_hybrid_mesh(dcn: int = 1, ici: Optional[int] = None,
                     axes=(DCN_AXIS, DATA_AXIS)) -> Mesh:
    """(dcn, ici) 2-axis mesh: the outer axis crosses hosts over DCN, the
    inner axis stays within a host's ICI domain (scaling-book layout).
    Data-parallel work shards its batch over BOTH axes with
    P((dcn_axis, data_axis)); gradient reductions then combine a fast ICI
    psum with one DCN hop instead of all-to-all over DCN.

    Multi-process: devices come from mesh_utils.create_hybrid_device_mesh
    so each DCN row is one process's ICI-contiguous devices. Single
    process (tests, virtual CPU mesh): a plain reshape gives the same
    2-process-style topology."""
    n = len(jax.devices())
    ici = ici if ici is not None else n // dcn
    if dcn * ici != n:
        raise ValueError(f"mesh {dcn}x{ici} != {n} devices")
    if jax.process_count() > 1:
        from jax.experimental import mesh_utils

        devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, ici), dcn_mesh_shape=(dcn, 1))
    else:
        devices = np.array(jax.devices()).reshape(dcn, ici)
    return Mesh(devices, axes)


def parse_mesh_spec(spec: str) -> Mesh:
    """'data:8' -> 1-axis mesh; 'dcn:2,data:4' -> hybrid 2-axis mesh;
    'data:2,model:4' -> data x tensor-parallel mesh (parallel/tp.py).
    The CLI's --mesh flag feeds this."""
    parts = dict(kv.split(":") for kv in spec.split(","))
    sizes = {k: int(v) for k, v in parts.items()}
    if set(sizes) == {DATA_AXIS}:
        return make_mesh(sizes[DATA_AXIS])
    if set(sizes) == {DCN_AXIS, DATA_AXIS}:
        return make_hybrid_mesh(dcn=sizes[DCN_AXIS], ici=sizes[DATA_AXIS])
    if set(sizes) == {DATA_AXIS, "model"}:
        from qdiffusion_tpu.parallel.tp import make_tp_mesh

        return make_tp_mesh(sizes[DATA_AXIS], sizes["model"])
    raise ValueError(f"unknown mesh axes {sorted(sizes)}; "
                     f"use 'data:N', 'dcn:H,data:N' or 'data:N,model:M'")


def batch_spec(mesh: Mesh, ndim: int) -> P:
    """PartitionSpec sharding a leading batch axis over every mesh axis."""
    return P(tuple(mesh.axis_names), *([None] * (ndim - 1)))


def shard_batch(x, mesh: Mesh, axis=None):
    """Shard the leading (batch) axis of every leaf over the mesh — over
    ALL mesh axes by default (works for 1-axis and hybrid meshes alike)."""
    def put(a):
        spec = batch_spec(mesh, a.ndim) if axis is None else P(
            axis, *([None] * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, x)


def replicate(x, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), x)


def dp_sample(sample_fn, x: Array, mesh: Mesh, *args, **kwargs):
    """Run a sampler data-parallel: batch sharded, everything else closed
    over (replicated). sample_fn(x, *args, **kwargs) -> samples."""
    xs = shard_batch(x, mesh)
    fn = jax.jit(lambda x: sample_fn(x, *args, **kwargs),
                 in_shardings=NamedSharding(mesh, batch_spec(mesh, x.ndim)),
                 )
    return fn(xs)


def dp_recon_step(loss_fn, train, opt, opt_state, batch, mesh: Mesh):
    """One data-parallel reconstruction step: per-shard grads are averaged
    by the batch-mean in the loss; XLA emits the cross-chip reduction."""

    def step(train, opt_state, batch):
        grads = jax.grad(loss_fn)(train, *batch)
        updates, opt_state = opt.update(grads, opt_state, train)
        return jax.tree_util.tree_map(lambda p, u: p + u, train, updates), opt_state

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    batch_shardings = jax.tree_util.tree_map(lambda _: data, batch)
    fn = jax.jit(step, in_shardings=(repl, repl, batch_shardings),
                 out_shardings=(repl, repl))
    return fn(train, opt_state, shard_batch(batch, mesh))
