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


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch(x, mesh: Mesh, axis: str = DATA_AXIS):
    """Shard leading (batch) axis of every leaf over the mesh."""
    def put(a):
        spec = P(axis, *([None] * (a.ndim - 1)))
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
                 in_shardings=NamedSharding(mesh, P(DATA_AXIS)),
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
