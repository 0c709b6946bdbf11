"""Noise-level classifier (reference ldm/models/diffusion/classifier.py):
q_sample formula, metric parity, a tiny end-to-end training run, and the
classifier-guidance hookup into dpm_solver_sample.
"""

import numpy as np
import jax
import jax.numpy as jnp

from qdiffusion_tpu.classifier import (
    NoisyClassifierTrainer,
    classifier_log_prob_fn,
    prepare_segmentation_targets,
    q_sample,
    top_k_accuracy,
)
from qdiffusion_tpu.models.encoder_unet import EncoderUNet, EncoderUNetConfig
from qdiffusion_tpu.schedules import NoiseSchedule

SCHED = NoiseSchedule.ddpm("linear", 1e-4, 2e-2, 100)


def _tiny_classifier(num_classes=3):
    cfg = EncoderUNetConfig(
        image_size=8, in_channels=3, model_channels=32,
        out_channels=num_classes, num_res_blocks=1,
        attention_resolutions=(), channel_mult=(1,), num_heads=4,
        pool="adaptive")
    return EncoderUNet(cfg)


def test_q_sample_formula():
    ac = SCHED.alphas_cumprod
    x0 = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 3))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([0, 10, 50, 99])
    got = q_sample(x0, t, noise, ac)
    for i, tt in enumerate([0, 10, 50, 99]):
        want = np.sqrt(ac[tt]) * x0[i] + np.sqrt(1 - ac[tt]) * noise[i]
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_top_k_accuracy():
    logits = jnp.asarray([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1],
                          [0.2, 0.3, 0.5]])
    labels = jnp.asarray([1, 1, 2])
    assert abs(float(top_k_accuracy(logits, labels, 1)) - 2 / 3) < 1e-6
    assert float(top_k_accuracy(logits, labels, 2)) == 1.0


def test_segmentation_target_prep():
    # (B, H, W, C) one-hot maps: downsample 2x twice, argmax channel
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 4, (2, 16, 16))
    onehot = jnp.asarray(np.eye(4, dtype=np.float32)[idx])
    got = prepare_segmentation_targets(onehot, num_downs=2)
    assert got.shape == (2, 4, 4)
    np.testing.assert_array_equal(np.asarray(got), idx[:, ::4, ::4])


def test_training_learns_separable_labels():
    """A linearly separable synthetic task (class = sign of the channel
    mean) must be learnable in a few AdamW steps — shared_step/train_step
    mirror reference classifier.py:179-200."""
    model = _tiny_classifier(num_classes=2)
    params = model.init_params(jax.random.PRNGKey(0))
    trainer = NoisyClassifierTrainer(model, SCHED.alphas_cumprod,
                                     num_classes=2, lr=2e-3)
    opt_state = trainer.init_optimizer(params)

    def batch(key):
        k1, k2 = jax.random.split(key)
        y = jax.random.randint(k1, (16,), 0, 2)
        base = jax.random.normal(k2, (16, 8, 8, 3)) * 0.1
        shift = (y.astype(jnp.float32) * 2 - 1).reshape(-1, 1, 1, 1) * 3.0
        return base + shift, y

    x0, y = batch(jax.random.PRNGKey(1))
    first = None
    for step in range(60):
        params, opt_state, metrics = trainer.train_step(
            params, opt_state, x0, y, jax.random.fold_in(
                jax.random.PRNGKey(2), step))
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(last)
    # random timesteps make high-noise items irreducibly hard; steady
    # decrease is the signal, not convergence
    assert last < first * 0.75, (first, last)

    # per-noise-level eval table (validation sweep, classifier.py:202-218)
    table = trainer.noise_level_accuracy(params, x0, y,
                                         jax.random.PRNGKey(3),
                                         log_every_t=50)
    assert set(table) == {0, 50}
    assert table[0]["acc@1"] >= table[50]["acc@1"] - 0.3  # low noise easier


def test_classifier_guided_dpm_solver():
    """classifier_log_prob_fn plugs into dpm_solver_sample's classifier_fn
    (reference 'classifier' guidance, dpm_solver_pytorch.py:385-412):
    guided sampling runs, is finite, and differs from unguided."""
    from qdiffusion_tpu.models.unet_ddim import DDIMUNet, DDIMUNetConfig
    from qdiffusion_tpu.samplers.dpm_solver import (
        NoiseScheduleVP, dpm_solver_sample)

    unet = DDIMUNet(DDIMUNetConfig(ch=32, ch_mult=(1,), num_res_blocks=1,
                                   attn_resolutions=(), resolution=8))
    uparams = unet.init_params(jax.random.PRNGKey(0))
    clf = _tiny_classifier(num_classes=2)
    cparams = clf.init_params(jax.random.PRNGKey(1))
    # the classification head is zero-initialized (OpenAI convention), so a
    # fresh classifier has logits==0 and exactly zero input-gradient —
    # jitter the params so guidance has a direction to push
    leaves, tdef = jax.tree_util.tree_flatten(cparams)
    keys = jax.random.split(jax.random.PRNGKey(9), len(leaves))
    cparams = jax.tree_util.tree_unflatten(tdef, [
        l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, keys)])
    y = jnp.asarray([0, 1])

    ns = NoiseScheduleVP("discrete", betas=SCHED.betas)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 3))
    fn = lambda xx, tt: unet.apply(uparams, xx, tt)
    plain = dpm_solver_sample(fn, x, ns, steps=4, order=2,
                              method="multistep")
    guided = dpm_solver_sample(
        fn, x, ns, steps=4, order=2, method="multistep",
        classifier_fn=classifier_log_prob_fn(clf, cparams, y),
        classifier_scale=5.0)
    assert np.isfinite(np.asarray(guided)).all()
    assert not np.allclose(np.asarray(guided), np.asarray(plain))
