"""Noise-level classifier: training + evaluation + guidance glue.

TPU-native re-implementation of the reference's
`NoisyLatentImageClassifier` (ldm/models/diffusion/classifier.py:28-236):
train an EncoderUNetModel (label_key 'class_label') or a UNetModel
(label_key 'segmentation') to predict labels from *noisy* latents x_t at
uniformly sampled diffusion timesteps, so its input-gradient can steer
sampling (classifier guidance — consumed by
samplers/dpm_solver.py::dpm_solver_sample(classifier_fn=...), the
reference 'classifier' guidance branch dpm_solver_pytorch.py:385-412).

Differences from the reference are idiomatic, not semantic:

  * the Lightning module becomes a pure `shared_step` loss function and a
    jitted optax train step over a param pytree (no trainer framework);
  * q_sample is the standard closed form sqrt(ac_t) x0 + sqrt(1-ac_t) eps
    (reference DDPM.q_sample, ddpm.py:289-293) with tables precomputed
    host-side;
  * AdamW(weight_decay=1e-2) matches configure_optimizers
    (classifier.py:220-236); the optional LambdaLR hook is served by
    utils/lr_scheduler schedules.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def q_sample(x0: Array, t: Array, noise: Array,
             alphas_cumprod: np.ndarray) -> Array:
    """Forward-diffuse clean latents to timestep t (DDPM closed form;
    reference ddpm.py:289-293 via classifier.py::get_x_noisy :110-118)."""
    ac = jnp.asarray(alphas_cumprod, x0.dtype)[t.astype(jnp.int32)]
    shape = (-1,) + (1,) * (x0.ndim - 1)
    return (jnp.sqrt(ac).reshape(shape) * x0
            + jnp.sqrt(1.0 - ac).reshape(shape) * noise)


def prepare_segmentation_targets(targets: Array, num_downs: int) -> Array:
    """Segmentation maps -> class indices at the latent resolution:
    nearest-downsample num_downs times then argmax over the one-hot
    channel (reference get_conditioning, classifier.py:133-148 +
    shared_step argmax :183-184). targets: (B, H, W, C) one-hot, NHWC."""
    for _ in range(num_downs):
        targets = targets[:, ::2, ::2, :]
    return jnp.argmax(targets, axis=-1)


def top_k_accuracy(logits: Array, labels: Array, k: int) -> Array:
    """Mean top-k accuracy (reference compute_top_k, classifier.py:150-155).
    logits (B, C) or (B, ..., C) with labels matching leading dims."""
    _, top = jax.lax.top_k(logits, k)
    hit = jnp.any(top == labels[..., None], axis=-1)
    return jnp.mean(hit.astype(jnp.float32))


@dataclasses.dataclass
class NoisyClassifierTrainer:
    """Training/eval harness for a noise-level classifier.

    model: a module with apply(params, x, t) -> logits — EncoderUNetModel
    for 'class_label' (pool head) or LDMUNet for 'segmentation' (the
    reference's __models__ map, classifier.py:16-19).
    alphas_cumprod: the frozen diffusion model's table (the classifier is
    trained against the SAME forward process it will guide).
    """

    model: object
    alphas_cumprod: np.ndarray
    num_classes: int
    label_key: str = "class_label"  # or 'segmentation'
    lr: float = 1e-4
    weight_decay: float = 1e-2  # reference classifier.py:221
    lr_schedule: Optional[Callable] = None  # step -> multiplier (LambdaLR)

    def __post_init__(self):
        import optax

        sched = (self.lr if self.lr_schedule is None
                 else lambda step: self.lr * self.lr_schedule(step))
        self._opt = optax.adamw(sched, weight_decay=self.weight_decay)
        self._train_step = jax.jit(self._train_step_impl)
        self._eval_step = jax.jit(self._shared_impl, static_argnums=())

    @property
    def num_timesteps(self) -> int:
        return int(np.asarray(self.alphas_cumprod).shape[0])

    def init_optimizer(self, params: dict):
        return self._opt.init(params)

    # ------------------------------------------------------------- steps

    def _shared_impl(self, params, x0, targets, t, noise):
        """loss/logits at given timesteps (reference shared_step,
        classifier.py:179-196). targets: int labels (class) or int maps
        (segmentation, already prepared)."""
        x_noisy = q_sample(x0, t, noise, self.alphas_cumprod)
        logits = self.model.apply(params, x_noisy, t.astype(jnp.float32))
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None],
                                   axis=-1).squeeze(-1)
        loss = jnp.mean(nll)
        metrics = {
            "loss": loss,
            "acc@1": top_k_accuracy(logits, targets, 1),
            "acc@5": top_k_accuracy(logits, targets,
                                    min(5, self.num_classes)),
        }
        return loss, (logits, metrics)

    def _train_step_impl(self, params, opt_state, x0, targets, t, noise):
        (loss, (_, metrics)), grads = jax.value_and_grad(
            self._shared_impl, has_aux=True)(params, x0, targets, t, noise)
        updates, opt_state = self._opt.update(grads, opt_state, params)
        import optax

        return optax.apply_updates(params, updates), opt_state, metrics

    def train_step(self, params, opt_state, x0, targets,
                   rng: jax.Array) -> Tuple[dict, object, dict]:
        """One AdamW step on a batch of CLEAN latents + labels; timesteps
        are sampled uniformly per item (reference shared_step t=None
        branch, classifier.py:185-188)."""
        k_t, k_n = jax.random.split(rng)
        t = jax.random.randint(k_t, (x0.shape[0],), 0, self.num_timesteps)
        noise = jax.random.normal(k_n, x0.shape, x0.dtype)
        return self._train_step(params, opt_state, x0, targets, t, noise)

    def eval_step(self, params, x0, targets, t: Array, rng: jax.Array):
        """loss/metrics at fixed timesteps (validation_step per-noise-level
        sweep, classifier.py:210-218)."""
        noise = jax.random.normal(rng, x0.shape, x0.dtype)
        _, (logits, metrics) = self._eval_step(params, x0, targets, t, noise)
        return logits, metrics

    def noise_level_accuracy(self, params, x0, targets, rng: jax.Array,
                             log_every_t: int = 100) -> dict:
        """acc@1/acc@5 per noise level over the timestep grid (reference
        reset_noise_accs + validation sweep, classifier.py:202-218)."""
        out = {}
        for i, tt in enumerate(range(0, self.num_timesteps, log_every_t)):
            t = jnp.full((x0.shape[0],), tt, jnp.int32)
            _, m = self.eval_step(params, x0, targets, t,
                                  jax.random.fold_in(rng, i))
            out[tt] = {"acc@1": float(m["acc@1"]), "acc@5": float(m["acc@5"])}
        return out


def classifier_log_prob_fn(model, params: dict, y: Array) -> Callable:
    """(x, t) -> per-item log p(y | x, t), the classifier_fn consumed by
    dpm_solver_sample (its jax.grad wrapper turns this into the
    eps <- eps - s*sigma_t*grad guidance term; reference
    dpm_solver_pytorch.py:385-412 cond_grad_fn)."""

    def log_prob(x, t):
        logits = model.apply(params, x, t.astype(jnp.float32))
        logp = jax.nn.log_softmax(logits, axis=-1)
        return jnp.take_along_axis(logp, y[..., None], axis=-1).squeeze(-1)

    return log_prob
