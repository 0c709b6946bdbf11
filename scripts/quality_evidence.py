"""In-environment quality evidence for the PTQ pipeline.

The reference's reason to exist is the claim that AdaRound + block
reconstruction keeps sample quality close to FP at 4-bit weights
(/root/reference/README.md:5, machinery at qdiff/block_recon.py:13-252).
Real-checkpoint FID is blocked on external artifacts (zero egress), so
this script produces the evidence in miniature, end to end, entirely
in-environment:

  1. Train a tiny DDPM (models/unet_ddim.py, the test TINY config) to
     convergence on a procedural two-blob image distribution — a jitted
     lax.scan training loop, minutes on this box.
  2. Sample with the FP model (samplers/ddim.py), keep the trajectory,
     and build calibration data with calib/samples.get_train_samples —
     the reference protocol (qdiff/utils.py:325-348).
  3. Quantize weights to `--bits` two ways: naive nearest rounding
     (init_weight_qstate alone) vs the full calibration pipeline
     (AdaRound + asymmetric block reconstruction, calib.engine.calibrate).
  4. Score FP / naive / calibrated sample sets against held-out TRUE
     samples with the in-repo FID (metrics/fid.py) over a fixed seeded
     random-CNN feature space (fixture features: the pt_inception weights
     are an external artifact; Frechet distance is defined for any fixed
     feature map, and a random CNN is the standard toy-scale choice).

Prints one JSON line:
  {"fid_fp": ..., "fid_naive": ..., "fid_calib": ..., "recovered_frac":
   (fid_naive - fid_calib) / (fid_naive - fid_fp), ...}
With --act it adds the W{bits}A8 arm (the reference's headline configs
quantize activations too, README.md:41-61): fid_naive_a8 (first-batch
act scale init) vs fid_calib_a8 (act-delta reconstruction + running-stat
EMA sweep), plus recovered_frac_a8.

recovered_frac > 0 is the first in-env demonstration that calibration
improves OUTPUT quality (test_calibration.py only shows block error
decreasing — the optimizer working, not the pipeline paying off).

Usage: python scripts/quality_evidence.py [--fast] [--bits 4]
                                          [--train-steps N] [--samples N]
"""

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from qdiffusion_tpu.calib.engine import (CalibConfig, calibrate,
                                         init_act_qstate,
                                         init_weight_qstate)
from qdiffusion_tpu.calib.recon import ReconConfig
from qdiffusion_tpu.calib.samples import get_train_samples
from qdiffusion_tpu.metrics import fid_from_features
from qdiffusion_tpu.models.unet_ddim import (DDIMUNet, DDIMUNetConfig,
                                             QuantPolicy)
from qdiffusion_tpu.quant.affine import AffineQuantizerSpec
from qdiffusion_tpu.quant.context import QuantCtx, QuantMode
from qdiffusion_tpu.samplers.ddim import ddim_sample
from qdiffusion_tpu.schedules import get_beta_schedule, make_skip_sequence

RES = 16
T = 1000
CFG = DDIMUNetConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                     attn_resolutions=(8,), resolution=RES)
BETAS = get_beta_schedule("linear", beta_start=1e-4, beta_end=0.02,
                          num_diffusion_timesteps=T)
ABAR = np.cumprod(1.0 - BETAS).astype(np.float32)


# ---------------------------------------------------------------- data


def synth_batch(key, n: int):
    """Procedural two-blob distribution: each image is two Gaussian color
    blobs at random positions/sizes on a zero background, in [-1, 1].
    Structured (position/color/scale correlations for FID to see) yet
    fully deterministic from the key — the 'dataset' is a function."""
    kpos, kcol, ksig = jax.random.split(key, 3)
    pos = jax.random.uniform(kpos, (n, 2, 2), minval=4.0, maxval=RES - 4.0)
    col = jax.random.uniform(kcol, (n, 2, 3), minval=-1.0, maxval=1.0)
    sig = jax.random.uniform(ksig, (n, 2), minval=1.2, maxval=2.5)
    yy, xx = jnp.meshgrid(jnp.arange(RES, dtype=jnp.float32),
                          jnp.arange(RES, dtype=jnp.float32), indexing="ij")
    grid = jnp.stack([yy, xx], -1)  # (H, W, 2)
    d2 = jnp.sum((grid[None, None] - pos[:, :, None, None, :]) ** 2, -1)
    blob = jnp.exp(-d2 / (2.0 * sig[:, :, None, None] ** 2))  # (n,2,H,W)
    img = jnp.einsum("nbhw,nbc->nhwc", blob, col)
    return jnp.clip(img, -1.0, 1.0)


# ---------------------------------------------------------------- training


def train(model, params, *, steps: int, batch: int = 128, lr: float = 2e-3,
          chunk: int = 250, seed: int = 0, log=print):
    """Jitted DDPM training (noise-prediction MSE over uniform timesteps);
    scans `chunk` optimizer steps per dispatch. Params are jit ARGUMENTS
    (never closed over — see CLAUDE.md)."""
    abar = jnp.asarray(ABAR)
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def loss_fn(p, key):
        kx, kt, ke = jax.random.split(key, 3)
        x0 = synth_batch(kx, batch)
        t = jax.random.randint(kt, (batch,), 0, T)
        eps = jax.random.normal(ke, x0.shape)
        a = abar[t][:, None, None, None]
        xt = jnp.sqrt(a) * x0 + jnp.sqrt(1.0 - a) * eps
        pred = model.apply(p, xt, t.astype(jnp.float32))
        return jnp.mean((pred - eps) ** 2)

    @jax.jit
    def run_chunk(p, s, key):
        def body(carry, k):
            p, s = carry
            l, g = jax.value_and_grad(loss_fn)(p, k)
            updates, s = opt.update(g, s)
            return (optax.apply_updates(p, updates), s), l

        keys = jax.random.split(key, chunk)
        (p, s), losses = jax.lax.scan(body, (p, s), keys)
        return p, s, losses.mean()

    key = jax.random.PRNGKey(seed + 1000)
    t0 = time.time()
    for i in range(0, steps, chunk):
        key, sub = jax.random.split(key)
        params, opt_state, mean_loss = run_chunk(params, opt_state, sub)
        log(f"  train step {min(i + chunk, steps)}/{steps}: "
            f"loss {float(mean_loss):.4f} ({time.time() - t0:.0f}s)")
    return params


# ---------------------------------------------------------------- sampling


def make_gen(model, seq, n: int, quantized: bool, trajectory: bool = False,
             act: bool = False):
    @partial(jax.jit, static_argnums=())
    def gen(params, qstate, noise, key):
        def model_fn(x, t):
            ctx = (QuantCtx(qstate, mode=QuantMode(w=True, a=act))
                   if quantized else QuantCtx())
            return model.apply(params, x, t, ctx)

        return ddim_sample(model_fn, noise, seq, BETAS, rng=key,
                           return_trajectory=trajectory)

    return gen


# ---------------------------------------------------------------- features


def feature_params(key, widths=(32, 64, 128)):
    """Fixed random 3x3 stride-2 CNN: the fixture feature space."""
    ps, cin = [], 3
    for w in widths:
        key, sub = jax.random.split(key)
        ps.append(jax.random.normal(sub, (3, 3, cin, w)) /
                  np.sqrt(9 * cin))
        cin = w
    return ps


@jax.jit
def extract_features(fps, imgs):
    """imgs: (N, H, W, 3) in [-1, 1] -> (N, widths[-1]) pooled features."""
    h = imgs
    for w in fps:
        h = jax.lax.conv_general_dilated(
            h, w, window_strides=(2, 2), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = jax.nn.leaky_relu(h, 0.2)
    return h.mean(axis=(1, 2))


# ---------------------------------------------------------------- protocol


def run_protocol(*, train_steps: int, n_samples: int, recon_iters: int,
                 bits: int, sample_steps: int = 100, cali_n: int = 64,
                 cali_st: int = 8, seed: int = 0, log=print,
                 act_quant: bool = False, recon_iters_a: int = None):
    policy = QuantPolicy(
        wq=AffineQuantizerSpec(n_bits=bits, channel_wise=True,
                               channel_axis=-1, scale_method="max"),
        aq=AffineQuantizerSpec(n_bits=8, scale_method="max",
                               leaf_param=True))
    model = DDIMUNet(CFG, policy)
    params = jax.jit(model.init_params)(jax.random.PRNGKey(seed))

    log(f"training tiny DDPM ({train_steps} steps, "
        f"backend={jax.default_backend()})")
    params = train(model, params, steps=train_steps, seed=seed, log=log)

    seq = make_skip_sequence(T, sample_steps)
    noise = jax.random.normal(jax.random.PRNGKey(seed + 1),
                              (n_samples, RES, RES, 3))
    gen_key = jax.random.PRNGKey(seed + 2)

    log("sampling FP (+ calibration trajectory)")
    gen_fp = make_gen(model, seq, n_samples, quantized=False,
                      trajectory=True)
    x_fp, traj = gen_fp(params, {}, noise, gen_key)
    x_fp = jax.block_until_ready(x_fp)

    cali_xs, cali_ts = get_train_samples(
        {"xs": traj["xs"], "ts": traj["ts"]}, cali_n, cali_st)

    log("quantizing: naive nearest rounding")
    qstate_naive = jax.jit(
        lambda p: init_weight_qstate(model, p))(params)

    log(f"quantizing: AdaRound + block reconstruction "
        f"({recon_iters} iters/unit)")
    ccfg = CalibConfig(weight=ReconConfig(iters=recon_iters, p=2.0),
                       quant_act=False, capture_batch=32)
    t0 = time.time()
    qstate_calib = calibrate(model, params, (cali_xs, cali_ts), ccfg,
                             rng=jax.random.PRNGKey(seed + 3))
    log(f"  calibration done in {time.time() - t0:.0f}s")

    gen_q = make_gen(model, seq, n_samples, quantized=True)
    log("sampling naive-W%d" % bits)
    x_naive, _ = gen_q(params, qstate_naive, noise, gen_key)
    log("sampling calibrated-W%d" % bits)
    x_calib, _ = gen_q(params, qstate_calib, noise, gen_key)

    score_sets = [("fp", x_fp), ("naive", x_naive), ("calib", x_calib)]

    if act_quant:
        # W{bits}A8 arm — the reference's headline configs quantize
        # activations too, with running stats (README.md:41-61;
        # set_running_stat, qdiff/quant_model.py:71-87). Naive = nearest
        # weights + first-batch act scale init (the reference's
        # uncalibrated init, sample_diffusion_ddim.py:203-208); calib =
        # the full engine path (AdaRound weight pass + act-delta
        # reconstruction + EMA running-stat sweep).
        n_init = min(64, cali_xs.shape[0])
        log("quantizing acts: naive first-batch init (W%dA8)" % bits)
        q_naive_a = init_act_qstate(model, params, qstate_naive,
                                    cali_xs[:n_init], cali_ts[:n_init])
        iters_a = recon_iters_a or max(recon_iters // 4, 1)
        log(f"quantizing acts: full W{bits}A8 calibration "
            f"({recon_iters} w-iters + {iters_a} a-iters/unit + "
            "running stats)")
        ccfg_a = CalibConfig(weight=ReconConfig(iters=recon_iters, p=2.0),
                             act=ReconConfig(iters=iters_a, p=2.0),
                             quant_act=True, running_stat=True,
                             capture_batch=32)
        t0 = time.time()
        q_calib_a = calibrate(model, params, (cali_xs, cali_ts), ccfg_a,
                              rng=jax.random.PRNGKey(seed + 3))
        log(f"  W{bits}A8 calibration done in {time.time() - t0:.0f}s")
        gen_qa = make_gen(model, seq, n_samples, quantized=True, act=True)
        log("sampling naive-W%dA8" % bits)
        x_naive_a, _ = gen_qa(params, q_naive_a, noise, gen_key)
        log("sampling calibrated-W%dA8" % bits)
        x_calib_a, _ = gen_qa(params, q_calib_a, noise, gen_key)
        score_sets += [("naive_a8", x_naive_a), ("calib_a8", x_calib_a)]

    log("scoring FID over fixture features")
    fps = feature_params(jax.random.PRNGKey(seed + 4))
    real = synth_batch(jax.random.PRNGKey(seed + 5), max(n_samples, 2048))
    f_real = np.asarray(extract_features(fps, real))
    fids = {}
    for tag, x in score_sets:
        f = np.asarray(extract_features(fps, jnp.clip(x, -1.0, 1.0)))
        fids[tag] = float(fid_from_features(f, f_real))
        log(f"  fid_{tag} = {fids[tag]:.4f}")
    gap = fids["naive"] - fids["fp"]
    recovered = (fids["naive"] - fids["calib"]) / gap if gap > 0 else 0.0
    out = {
        "metric": "quality_evidence_fid",
        "bits": bits,
        "train_steps": train_steps,
        "n_samples": n_samples,
        "recon_iters": recon_iters,
        "fid_fp": round(fids["fp"], 4),
        "fid_naive": round(fids["naive"], 4),
        "fid_calib": round(fids["calib"], 4),
        "recovered_frac": round(recovered, 4),
    }
    if act_quant:
        gap_a = fids["naive_a8"] - fids["fp"]
        rec_a = ((fids["naive_a8"] - fids["calib_a8"]) / gap_a
                 if gap_a > 0 else 0.0)
        out.update({
            "recon_iters_a": iters_a,
            "fid_naive_a8": round(fids["naive_a8"], 4),
            "fid_calib_a8": round(fids["calib_a8"], 4),
            "recovered_frac_a8": round(rec_a, 4),
        })
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true",
                    help="reduced settings (CI-scale)")
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--train-steps", type=int, default=None)
    ap.add_argument("--samples", type=int, default=None)
    ap.add_argument("--recon-iters", type=int, default=None)
    ap.add_argument("--act", action="store_true",
                    help="add the W{bits}A8 arm (naive first-batch act "
                         "init vs full act-recon + running-stat "
                         "calibration)")
    args = ap.parse_args()

    steps = args.train_steps or (1500 if args.fast else 6000)
    n = args.samples or (256 if args.fast else 1024)
    iters = args.recon_iters or (500 if args.fast else 3000)
    out = run_protocol(train_steps=steps, n_samples=n, recon_iters=iters,
                       bits=args.bits, act_quant=args.act)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
