"""Auxiliary subsystems: EMA, data transforms, BOPS accounting, BERT text
encoder parity, checkpoint save/load round trips."""

import sys
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

REF = Path("/root/reference")


def test_ema_update_formula():
    from qdiffusion_tpu.utils.ema import ema_init, ema_swap, ema_update

    params = {"w": jnp.ones((4,))}
    shadow = ema_init(params)
    new_params = {"w": jnp.full((4,), 3.0)}
    shadow = ema_update(shadow, new_params, mu=0.9)
    np.testing.assert_allclose(shadow["w"], 0.9 * 1.0 + 0.1 * 3.0)
    a, b = ema_swap(shadow, new_params)
    np.testing.assert_allclose(a["w"], 3.0)


def test_data_transform_roundtrip():
    from qdiffusion_tpu.data import (
        DataTransformConfig,
        data_transform,
        inverse_data_transform,
    )

    cfg = DataTransformConfig(rescaled=True)
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 4, 4, 3)),
                    jnp.float32)
    y = data_transform(cfg, x)
    assert float(y.min()) >= -1 and float(y.max()) <= 1
    back = inverse_data_transform(cfg, y)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)

    cfg_logit = DataTransformConfig(rescaled=False, logit_transform=True)
    y = data_transform(cfg_logit, x)
    back = inverse_data_transform(cfg_logit, y)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)


def test_bops_accounting():
    from qdiffusion_tpu.utils.flops import conv_macs, dense_macs, model_bops
    from qdiffusion_tpu.ops.qlayers import LayerQuantConfig
    from qdiffusion_tpu.quant.affine import AffineQuantizerSpec

    macs = conv_macs((1, 8, 8, 16), (3, 3, 16, 32))
    assert macs == 8 * 8 * 32 * 3 * 3 * 16
    cfgs = {"conv": LayerQuantConfig(
        wq=AffineQuantizerSpec(n_bits=4), aq=AffineQuantizerSpec(n_bits=8))}
    bops = model_bops({"conv": {"macs": macs}}, cfgs)
    assert bops == macs * 32
    # unquantized layer counts at 16x16
    bops2 = model_bops({"other": {"macs": 100}}, cfgs)
    assert bops2 == 100 * 256


def test_xla_flops_matmul():
    from qdiffusion_tpu.utils.flops import xla_flops

    f = lambda a, b: a @ b
    a = jnp.ones((64, 128))
    b = jnp.ones((128, 256))
    fl = xla_flops(f, a, b)
    if fl is not None and fl == fl:  # may be unavailable on some backends
        np.testing.assert_allclose(fl, 2 * 64 * 128 * 256, rtol=0.01)


def test_qstate_checkpoint_roundtrip(tmp_path):
    from qdiffusion_tpu.utils.checkpoints import load_qstate, save_qstate

    qstate = {"down.0.block.0.conv1": {
        "w": {"delta": np.ones((1, 1, 1, 4), np.float32),
              "zero_point": np.zeros((1, 1, 1, 4), np.float32),
              "alpha": np.random.default_rng(0).normal(
                  size=(3, 3, 2, 4)).astype(np.float32)},
        "a": {"delta": np.float32(0.1), "zero_point": np.float32(3.0),
              "x_min": np.float32(-1.0), "x_max": np.float32(2.0)}}}
    save_qstate(tmp_path / "q.npz", qstate)
    back = load_qstate(tmp_path / "q.npz")
    np.testing.assert_allclose(back["down.0.block.0.conv1"]["w"]["alpha"],
                               qstate["down.0.block.0.conv1"]["w"]["alpha"])
    assert set(back["down.0.block.0.conv1"]["a"]) == {
        "delta", "zero_point", "x_min", "x_max"}


def test_tree_to_host_packed_chunked():
    """Chunked device->host packing (the SD-scale OOM fix): identical
    results for any max_chunk_bytes, incl. one forcing per-leaf chunks
    and one smaller than the largest single leaf."""
    from qdiffusion_tpu.utils.checkpoints import tree_to_host_packed

    rng = np.random.default_rng(0)
    tree = {"a": jnp.asarray(rng.normal(size=(7, 5)).astype(np.float32)),
            "b": {"c": jnp.asarray(rng.normal(size=(129,)).astype(np.float32)),
                  "d": jnp.asarray(np.int32(3)),
                  "e": jnp.asarray(rng.normal(size=(64,)).astype(np.float32))}}
    want = jax.tree_util.tree_map(np.asarray, tree)
    for max_bytes in (1, 200, 1 << 30):
        got = tree_to_host_packed(tree, max_chunk_bytes=max_bytes)
        assert all(isinstance(l, np.ndarray)
                   for l in jax.tree_util.tree_leaves(got))
        jax.tree_util.tree_map(np.testing.assert_array_equal, want, got)


def test_calib_checkpointer_incremental(tmp_path):
    """Incremental snapshots: base + site increments replay to the same
    qstate, and increments only carry the changed sites."""
    from qdiffusion_tpu.utils.checkpoints import CalibCheckpointer, load_qstate

    rng = np.random.default_rng(1)
    mk = lambda: {"w": {"delta": rng.normal(size=(4,)).astype(np.float32)}}
    qstate = {f"site{i}": mk() for i in range(4)}

    ck = CalibCheckpointer(tmp_path)
    ck.save(qstate, "weight", 0, sites=["site0"])  # no base yet -> full
    assert (tmp_path / "qstate_wip.npz").exists()
    qstate["site1"] = mk()
    ck.save(qstate, "weight", 1, sites=["site1"])
    inc = load_qstate(tmp_path / "qstate_inc_0000.npz")
    assert set(inc) == {"site1"}
    qstate["site2"] = mk()
    qstate["site3"] = mk()
    ck.save(qstate, "weight", 3, sites=["site2", "site3"])

    ck2 = CalibCheckpointer(tmp_path)
    back, progress = ck2.load()
    assert progress == {"phase": "weight", "unit_idx": 3, "n_inc": 2}
    jax.tree_util.tree_map(np.testing.assert_array_equal, qstate, back)
    # a later full save (sites=None) clears the increments
    ck2.save(qstate, "act", 0, sites=None)
    assert not list(tmp_path.glob("qstate_inc_*.npz"))
    ck2.finalize(qstate)
    assert (tmp_path / "qstate.npz").exists()
    assert not (tmp_path / "calib_progress.json").exists()


def test_calib_checkpointer_crash_window(tmp_path):
    """A full save writes the marker (n_inc=0) BEFORE deleting old
    increments: a crash mid-full-save must never leave a marker whose
    n_inc points at deleted inc files (that breaks the very crash-resume
    this checkpointer exists for — ADVICE r4)."""
    import json

    from qdiffusion_tpu.utils.checkpoints import CalibCheckpointer

    rng = np.random.default_rng(2)
    mk = lambda: {"w": {"delta": rng.normal(size=(4,)).astype(np.float32)}}
    qstate = {f"site{i}": mk() for i in range(3)}

    ck = CalibCheckpointer(tmp_path)
    ck.save(qstate, "weight", -1, sites=None)  # base
    qstate["site1"] = mk()
    ck.save(qstate, "weight", 1, sites=["site1"])  # increment 0

    # simulate the crash window: full save that dies AFTER the base +
    # marker writes but BEFORE unlinking old increments
    real_unlink = Path.unlink

    def dying_unlink(self, *a, **kw):
        if self.name.startswith("qstate_inc_"):
            raise RuntimeError("simulated crash mid-unlink")
        return real_unlink(self, *a, **kw)

    qstate["site2"] = mk()
    import unittest.mock as mock
    with mock.patch.object(Path, "unlink", dying_unlink):
        with pytest.raises(RuntimeError, match="simulated crash"):
            ck.save(qstate, "act", -1, sites=None)

    # marker already says n_inc=0, so the orphaned inc file is ignored
    # and load() restores the freshly written base
    marker = json.loads((tmp_path / "calib_progress.json").read_text())
    assert marker == {"phase": "act", "unit_idx": -1, "n_inc": 0}
    assert list(tmp_path.glob("qstate_inc_*.npz"))  # orphan survives
    back, progress = CalibCheckpointer(tmp_path).load()
    assert progress["n_inc"] == 0
    jax.tree_util.tree_map(np.testing.assert_array_equal, qstate, back)


def test_bert_text_parity():
    if not REF.exists():
        pytest.skip("reference repo not mounted")
    sys.path.insert(0, str(REF))
    import torch
    from ldm.modules.x_transformer import Encoder, TransformerWrapper

    torch.manual_seed(0)
    wrapper = TransformerWrapper(
        num_tokens=60, max_seq_len=12,
        attn_layers=Encoder(dim=32, depth=2)).eval()

    ids = np.array([[1, 5, 7, 9, 0, 0], [3, 2, 8, 0, 0, 0]], np.int64)
    with torch.no_grad():
        ref = wrapper(torch.from_numpy(ids), return_embeddings=True).numpy()

    from qdiffusion_tpu.models.bert_text import BERTTextConfig, BERTTextEncoder
    from qdiffusion_tpu.models.torch_import import state_dict_to_pytree

    sd = {f"transformer.{k}": v for k, v in wrapper.state_dict().items()}
    params = state_dict_to_pytree(sd)
    # embeddings: undo the 2-D transpose for lookup tables
    tr = params["transformer"]
    tr["token_emb"] = {"weight": np.transpose(tr["token_emb"]["w"])}
    tr["pos_emb"]["emb"] = {"weight": np.transpose(tr["pos_emb"]["emb"]["w"])}

    model = BERTTextEncoder(BERTTextConfig(n_embed=32, n_layer=2,
                                           vocab_size=60, max_seq_len=12,
                                           heads=8, dim_head=64))
    ours = model.apply(params, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-4)


def test_ckpt_registry_offline_behaviour(tmp_path):
    from qdiffusion_tpu.utils.ckpt_registry import get_ckpt_path

    # existing file resolves without any network access
    p = tmp_path / "cifar10.ckpt"
    p.write_bytes(b"x")
    assert get_ckpt_path("cifar10", root=str(tmp_path)) == p
    with pytest.raises(KeyError):
        get_ckpt_path("nonexistent_model", root=str(tmp_path))


def test_lr_schedules_match_reference():
    """warmup-cosine(-cycles)/linear-cycles match the reference classes
    value-for-value (ldm/lr_scheduler.py)."""
    import sys
    from pathlib import Path

    ref = Path("/root/reference")
    if not ref.exists():
        import pytest

        pytest.skip("reference repo not mounted")
    if str(ref) not in sys.path:
        sys.path.insert(0, str(ref))
    import numpy as np
    from ldm.lr_scheduler import (
        LambdaLinearScheduler,
        LambdaWarmUpCosineScheduler,
        LambdaWarmUpCosineScheduler2,
    )

    from qdiffusion_tpu.utils.lr_scheduler import (
        warmup_cosine,
        warmup_cosine_cycles,
        warmup_linear_cycles,
    )

    r1 = LambdaWarmUpCosineScheduler(100, 0.01, 1.0, 0.1, 1000)
    s1 = warmup_cosine(100, 0.01, 1.0, 0.1, 1000)
    for n in [0, 1, 50, 99, 100, 101, 500, 999, 1000, 5000]:
        np.testing.assert_allclose(float(s1(n)), r1(n), rtol=1e-12)

    args = dict(warm_up_steps=[10, 5], f_min=[0.1, 0.01], f_max=[1.0, 0.5],
                f_start=[0.0, 0.05])
    r2 = LambdaWarmUpCosineScheduler2(cycle_lengths=[100, 200], **args)
    s2 = warmup_cosine_cycles(cycle_lengths=[100, 200], **args)
    r3 = LambdaLinearScheduler(cycle_lengths=[100, 200], **args)
    s3 = warmup_linear_cycles(cycle_lengths=[100, 200], **args)
    for n in range(0, 300, 7):
        np.testing.assert_allclose(float(s2(n)), r2(n), rtol=1e-12), n
        np.testing.assert_allclose(float(s3(n)), r3(n), rtol=1e-12), n


def test_docs_in_sync_with_newest_bench():
    """Doc truth-sync is a suite invariant (round-3/4 verdicts both
    flagged stale README/PERF_NOTES numbers and phantom pointers):
    scripts/check_docs.py must pass against the newest BENCH_r*.json."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "check_docs",
        Path(__file__).resolve().parent.parent / "scripts" / "check_docs.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.main() == 0
