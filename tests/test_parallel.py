"""Data-parallel mesh tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from qdiffusion_tpu.parallel.mesh import make_mesh, replicate, shard_batch


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_shard_batch_layout():
    mesh = make_mesh()
    x = jnp.arange(16 * 4, dtype=jnp.float32).reshape(16, 4)
    xs = shard_batch(x, mesh)
    assert xs.sharding.spec == P("data", None)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(x))


def test_dp_sampling_matches_single_device():
    """Sharded sampling == replicated sampling (SPMD, zero collectives)."""
    from qdiffusion_tpu.models.unet_ddim import DDIMUNet, DDIMUNetConfig
    from qdiffusion_tpu.samplers.ddim import ddim_sample
    from qdiffusion_tpu.schedules import get_beta_schedule, make_skip_sequence

    model = DDIMUNet(DDIMUNetConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                                    attn_resolutions=(), resolution=8))
    params = model.init_params(jax.random.PRNGKey(0))
    betas = get_beta_schedule("linear", beta_start=1e-4, beta_end=0.02,
                              num_diffusion_timesteps=100)
    seq = make_skip_sequence(100, 4, "uniform")
    fn = lambda x, t: model.apply(params, x, t)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 8, 8, 3))

    y_single = ddim_sample(fn, x, seq, betas, eta=0.0)[0]

    mesh = make_mesh()
    data = NamedSharding(mesh, P("data"))
    sample = jax.jit(lambda x: ddim_sample(fn, x, seq, betas, eta=0.0)[0],
                     in_shardings=data, out_shardings=data)
    y_dp = sample(jax.device_put(x, data))
    np.testing.assert_allclose(np.asarray(y_dp), np.asarray(y_single),
                               rtol=1e-5, atol=1e-5)


def test_dp_calibration_grads_reduce():
    """Per-shard gradients mean-reduce across the mesh: DP loss grad equals
    single-device grad (the reference's dead multi_gpu allreduce,
    block_recon.py:147-150, implemented)."""
    import optax

    mesh = make_mesh()
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    w = jnp.ones((4,))
    xs = jax.random.normal(jax.random.PRNGKey(0), (32, 4))
    ys = jax.random.normal(jax.random.PRNGKey(1), (32,))

    def loss(w, x, y):
        return jnp.mean((x @ w - y) ** 2)

    g_single = jax.grad(loss)(w, xs, ys)
    g_dp = jax.jit(jax.grad(loss),
                   in_shardings=(repl, data, data),
                   out_shardings=repl)(
        jax.device_put(w, repl), jax.device_put(xs, data),
        jax.device_put(ys, data))
    np.testing.assert_allclose(np.asarray(g_dp), np.asarray(g_single),
                               rtol=1e-6)


def test_graft_dryrun_multichip():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_hybrid_mesh_two_process_style():
    """2-process-style hybrid mesh on the 8-device virtual host: outer
    'dcn' axis (2 hosts) x inner 'data' ICI axis (4 devices); batch shards
    over both axes and dp results match single-device."""
    from qdiffusion_tpu.parallel.mesh import (
        batch_spec, make_hybrid_mesh, shard_batch)

    mesh = make_hybrid_mesh(dcn=2)
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("dcn", "data")

    x = jax.random.normal(jax.random.PRNGKey(0), (16, 8, 8, 3))
    xs = shard_batch(x, mesh)
    # batch axis split over both mesh axes: 16/(2*4)=2 per device
    assert xs.sharding.spec == batch_spec(mesh, 4)
    assert xs.addressable_shards[0].data.shape == (2, 8, 8, 3)

    fn = lambda x: jnp.tanh(x) * 2.0 + jnp.mean(x)
    y_single = fn(x)
    y_dp = jax.jit(fn)(xs)
    # sharded reduction order differs from single-device by float noise
    np.testing.assert_allclose(np.asarray(y_dp), np.asarray(y_single),
                               rtol=1e-5, atol=1e-6)


def test_parse_mesh_spec():
    from qdiffusion_tpu.parallel.mesh import parse_mesh_spec

    m1 = parse_mesh_spec("data:8")
    assert m1.devices.shape == (8,)
    m2 = parse_mesh_spec("dcn:4,data:2")
    assert m2.devices.shape == (4, 2)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown mesh axes"):
        parse_mesh_spec("model:8")
    with _pytest.raises(ValueError, match="devices"):
        parse_mesh_spec("dcn:3,data:3")


def test_distributed_init_single_process_noop():
    from qdiffusion_tpu.parallel.mesh import distributed_init

    distributed_init()  # single process: must not raise
    distributed_init()  # idempotent
    assert jax.process_count() == 1


def test_cli_mesh_flag(tmp_path, monkeypatch):
    from qdiffusion_tpu import cli
    from qdiffusion_tpu import config as qconfig
    from qdiffusion_tpu.config import SamplerConfig, ScheduleConfig, TaskConfig
    from qdiffusion_tpu.models.unet_ddim import DDIMUNetConfig

    task = TaskConfig(
        name="tiny-mesh", family="pixel",
        schedule=ScheduleConfig("ddpm", "linear", 1e-4, 2e-2, 100),
        sampler=SamplerConfig("generalized", 4, "uniform", 0.0),
        image_size=8, channels=3,
        unet_ddim=DDIMUNetConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                                 attn_resolutions=(), resolution=8))
    monkeypatch.setitem(qconfig.PRESETS, "tiny-mesh", task)
    out = tmp_path / "imgs"
    cli.main(["sample", "--task", "tiny-mesh", "--n", "8", "--batch", "8",
              "--mesh", "dcn:2,data:4", "--out", str(out)])
    assert len(list(out.glob("*.png"))) == 8
