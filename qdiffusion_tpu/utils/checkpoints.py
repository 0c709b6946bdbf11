"""Checkpointing: one orbax tree per artifact, no Parameter promotion.

The reference needs a two-phase load dance because quantizer tensors are
plain module attributes (resume_cali_model, qdiff/utils.py:382-457). Here
params and qstate are pytrees, so save/restore is trivial, and resumable
calibration (the reference's mid-run temp ckpts, txt2img.py:422-428)
is a per-unit qstate snapshot + progress marker.

Also includes the torch-checkpoint ingestion helpers for the reference's
published FP checkpoints (pesser DDPM ckpts, Lightning LDM/SD ckpts).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Optional, Tuple

import jax
import numpy as np

logger = logging.getLogger(__name__)


def save_pytree(path, tree) -> None:
    """Save a pytree of arrays as a flat npz (portable, no async machinery
    needed at these sizes; orbax is used for large multi-host runs)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    np.savez(path, __treedef__=np.frombuffer(
        repr(treedef).encode(), dtype=np.uint8),
        **{str(i): np.asarray(l) for i, l in enumerate(leaves)})


def load_pytree(path, like) -> dict:
    """Restore into the structure of `like` (same treedef)."""
    data = np.load(Path(path), allow_pickle=False)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    restored = [data[str(i)] for i in range(len(leaves))]
    return jax.tree_util.tree_unflatten(treedef, restored)


def save_pytree_orbax(path, tree) -> None:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(Path(path).absolute(), tree, force=True)


def load_pytree_orbax(path, like=None):
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            return ckptr.restore(Path(path).absolute(), like)
        return ckptr.restore(Path(path).absolute())


# ---------------------------------------------------------------------------
# qstate (nested dict of dicts of arrays) — self-describing format
# ---------------------------------------------------------------------------


def save_nested(path, tree: dict) -> None:
    """Arbitrary-depth nested dict of arrays -> self-describing npz with
    '/'-joined keys (param names never contain '/'). Unlike save_pytree the
    result is loadable without a `like` structure — used for VAE/CLIP param
    files so deployments don't need torch."""
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else str(k), v)
        else:
            flat[prefix] = np.asarray(node)

    walk("", tree)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **flat)


def load_nested(path) -> dict:
    data = np.load(Path(path), allow_pickle=False)
    tree: dict = {}
    for key in data.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    return tree


def tree_to_host_packed(tree, max_chunk_bytes: int = 256 << 20):
    """Pull a pytree of device arrays to host numpy in FEW transfers.
    Per-leaf np.asarray costs one round-trip per array on remote-dispatch
    setups — a calibrated qstate has ~700 leaves, measured ~10 minutes
    through the axon tunnel vs seconds for a packed pull.

    Packing is chunked at `max_chunk_bytes` per device-side concatenation:
    an unbounded pack of an SD-scale qstate (~3.4 GB of weight-shaped
    AdaRound alphas) allocates the whole packed copy NEXT TO params +
    capture buffers and OOM'd the 16 GB v5e mid-calibration
    (runs/logs_r4_sd/calibrate.log). Chunking bounds the spike while
    keeping transfers O(total/chunk) instead of O(leaves).

    The packed path still needs ONE device-side allocation per chunk; at
    peak calibration residency even that can fail (the unit-72 increment
    save, runs/logs_r5_sd/calibrate_r5_resume.log). On RESOURCE_EXHAUSTED
    the affected chunk falls back to per-leaf pulls — a plain D2H read
    per array, zero device allocation — so a checkpoint can always be
    written no matter how full HBM is; only its wall time degrades."""
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if not leaves or all(isinstance(a, np.ndarray) for a in leaves):
        return tree
    by_dtype: dict = {}
    for i, a in enumerate(leaves):
        by_dtype.setdefault(jnp.result_type(a).name, []).append(i)
    host_leaves: list = [None] * len(leaves)
    for dt, idxs in by_dtype.items():
        itemsize = np.dtype(dt).itemsize
        chunks: list = []
        cur: list = []
        cur_bytes = 0
        for i in idxs:
            shape = np.shape(leaves[i])
            nbytes = (int(np.prod(shape)) if shape else 1) * itemsize
            if cur and cur_bytes + nbytes > max_chunk_bytes:
                chunks.append(cur)
                cur, cur_bytes = [], 0
            cur.append(i)
            cur_bytes += nbytes
        if cur:
            chunks.append(cur)
        for chunk in chunks:
            try:
                packed = np.asarray(jnp.concatenate(
                    [jnp.ravel(jnp.asarray(leaves[i])) for i in chunk]))
            except jax.errors.JaxRuntimeError as e:
                if "RESOURCE_EXHAUSTED" not in str(e):
                    raise
                logger.warning(
                    "packed checkpoint pull hit RESOURCE_EXHAUSTED "
                    "(%d leaves); falling back to per-leaf transfers",
                    len(chunk))
                for i in chunk:
                    host_leaves[i] = np.asarray(leaves[i])
                continue
            off = 0
            for i in chunk:
                shape = np.shape(leaves[i])
                n = int(np.prod(shape)) if shape else 1
                host_leaves[i] = packed[off:off + n].reshape(shape)
                off += n
    return jax.tree_util.tree_unflatten(treedef, host_leaves)


def save_qstate(path, qstate: dict) -> None:
    """qstate: {site: {slot: {leaf: array}}} -> npz with '/'-joined keys.

    bfloat16 leaves (CalibConfig.alpha_dtype='bfloat16' AdaRound alphas)
    are stored as uint16 views under a '#bf16'-suffixed key: np.savez
    silently degrades ml_dtypes arrays to void records that np.load
    cannot interpret."""
    qstate = tree_to_host_packed(qstate)
    flat = {}
    for site, slots in qstate.items():
        for slot, st in slots.items():
            for leaf, arr in st.items():
                arr = np.asarray(arr)
                key = f"{site}/{slot}/{leaf}"
                if arr.dtype == np.dtype("bfloat16"):
                    key, arr = key + "#bf16", arr.view(np.uint16)
                flat[key] = arr
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **flat)


def load_qstate(path) -> dict:
    data = np.load(Path(path), allow_pickle=False)
    qstate: dict = {}
    for key in data.files:
        arr = data[key]
        if key.endswith("#bf16"):
            key, arr = key[: -len("#bf16")], arr.view(np.dtype("bfloat16"))
        site, slot, leaf = key.rsplit("/", 2)
        qstate.setdefault(site, {}).setdefault(slot, {})[leaf] = arr
    return qstate


# ---------------------------------------------------------------------------
# resumable calibration
# ---------------------------------------------------------------------------


class CalibCheckpointer:
    """Snapshot qstate at the engine's ckpt_every cadence so a crashed
    calibration resumes where it stopped (reference behavior replaced:
    mid-calibration temp ckpts, txt2img.py:422-428).

    Snapshots are INCREMENTAL: one full base (`qstate_wip.npz`) written
    by the engine BEFORE each phase's unit loop (when no capture buffers
    are resident on device), plus per-snapshot `qstate_inc_*.npz` files
    holding only the sites reconstructed since the previous snapshot. At
    SD scale the qstate is weight-sized (AdaRound alphas ~3.4 GB f32 for
    the 860M-param UNet); pulling all of it mid-loop OOM'd the 16 GB
    v5e (round 4), and rewriting it every few units would dominate wall
    time — an increment is a few units' sites instead. `load()` replays
    base + increments in order (site-level replace; every increment
    carries complete per-site dicts)."""

    def __init__(self, run_dir):
        self.dir = Path(run_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.marker = self.dir / "calib_progress.json"
        self._n_inc: Optional[int] = None  # None = no base written/loaded

    @property
    def has_base(self) -> bool:
        return self._n_inc is not None

    def _inc_path(self, i: int) -> Path:
        return self.dir / f"qstate_inc_{i:04d}.npz"

    def load(self) -> Tuple[Optional[dict], Optional[dict]]:
        if not self.marker.exists():
            return None, None
        progress = json.loads(self.marker.read_text())
        qstate = load_qstate(self.dir / "qstate_wip.npz")
        n_inc = int(progress.get("n_inc", 0))
        for i in range(n_inc):
            qstate.update(load_qstate(self._inc_path(i)))
        self._n_inc = n_inc
        logger.info("resuming calibration from %s", progress)
        return qstate, progress

    def save(self, qstate: dict, phase: str, unit_idx: int,
             sites=None) -> bool:
        """`sites`: names changed since the previous save; None forces a
        full base snapshot (also forced when no base exists yet).

        BEST-EFFORT: returns False (and leaves checkpoint state
        untouched) when the device pull hits RESOURCE_EXHAUSTED — at
        peak SD-scale residency even a per-leaf D2H read can need an
        on-device staging buffer that isn't there (unit-72 increment,
        runs/logs_r5_sd/calibrate_r5_resume2.log). A snapshot must never
        kill the run it exists to protect; the engine keeps the pending
        sites and retries at the next buffer-free point (group
        boundary). save_qstate pulls before writing any file, so a
        failed save leaves no partial artifacts.

        A full base pulls the ENTIRE qstate to host — at SD scale the
        AdaRound alpha tree is weight-sized (~3.4 GB f32 for the 860M
        UNet), and doing that mid-loop next to live capture buffers
        OOM'd the 16 GB v5e three times in round 4
        (runs/logs_r4_sd/calibrate*.log). The engine therefore writes
        the base at a buffer-free point BEFORE each unit loop
        (engine.calibrate) and every in-loop save is an increment;
        `sites=None` here is only for those loop-entry base writes.

        Crash-safety ordering in the full branch: base, then marker
        (n_inc=0), then the old increments. A crash after the marker
        rewrite leaves orphaned inc files that n_inc=0 ignores; the old
        order left a marker whose n_inc pointed at deleted files, so the
        very crash this checkpointer exists for (e.g. an OOM kill)
        broke the subsequent load()."""
        try:
            if self._n_inc is None or sites is None:
                save_qstate(self.dir / "qstate_wip.npz", qstate)
                self._n_inc = 0
                self.marker.write_text(json.dumps(
                    {"phase": phase, "unit_idx": unit_idx, "n_inc": 0}))
                for p in self.dir.glob("qstate_inc_*.npz"):
                    p.unlink()
            else:
                delta = {s: qstate[s] for s in sites if s in qstate}
                save_qstate(self._inc_path(self._n_inc), delta)
                self._n_inc += 1
                self.marker.write_text(json.dumps(
                    {"phase": phase, "unit_idx": unit_idx,
                     "n_inc": self._n_inc}))
        except jax.errors.JaxRuntimeError as e:
            if "RESOURCE_EXHAUSTED" not in str(e):
                raise
            logger.warning(
                "qstate snapshot at %s unit %d deferred: device pull hit "
                "RESOURCE_EXHAUSTED; will retry at the next buffer-free "
                "point", phase, unit_idx)
            return False
        return True

    def finalize(self, qstate: dict) -> None:
        save_qstate(self.dir / "qstate.npz", qstate)
        if self.marker.exists():
            self.marker.unlink()
        for p in self.dir.glob("qstate_inc_*.npz"):
            p.unlink()


# ---------------------------------------------------------------------------
# torch checkpoint ingestion
# ---------------------------------------------------------------------------


def load_torch_checkpoint(path, *, ema: bool = True,
                          subtree: Optional[str] = None) -> dict:
    """Load a reference FP checkpoint into numpy arrays.

    Handles: raw state_dict files (pesser DDPM ckpts,
    sample_diffusion_ddim.py:114-122) and Lightning {'state_dict': ...}
    ckpts (LDM/SD, txt2img.py:57-74). `subtree` filters by key prefix
    (e.g. 'model.diffusion_model.'); `ema` prefers model_ema weights when
    present (ldm.py:449-450 ema swap).
    """
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(raw, dict) and "state_dict" in raw:
        raw = raw["state_dict"]
    if isinstance(raw, (list, tuple)):  # ddim runner saves [model, ema, ...]
        raw = raw[-1] if ema and len(raw) > 1 else raw[0]
        if hasattr(raw, "state_dict"):
            raw = raw.state_dict()
    sd = {}
    for k, v in raw.items():
        if subtree:
            if not k.startswith(subtree):
                continue
            k = k[len(subtree):]
        sd[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return sd
