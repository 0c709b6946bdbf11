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


def tree_to_host_packed(tree):
    """Pull a pytree of device arrays to host numpy in ONE transfer per
    dtype. Per-leaf np.asarray costs one round-trip per array on
    remote-dispatch setups — a calibrated qstate has ~700 leaves, measured
    ~10 minutes through the axon tunnel vs seconds for a packed pull."""
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
        packed = np.asarray(jnp.concatenate(
            [jnp.ravel(jnp.asarray(leaves[i])) for i in idxs]))
        off = 0
        for i in idxs:
            shape = np.shape(leaves[i])
            n = int(np.prod(shape)) if shape else 1
            host_leaves[i] = packed[off:off + n].reshape(shape)
            off += n
    return jax.tree_util.tree_unflatten(treedef, host_leaves)


def save_qstate(path, qstate: dict) -> None:
    """qstate: {site: {slot: {leaf: array}}} -> npz with '/'-joined keys."""
    qstate = tree_to_host_packed(qstate)
    flat = {}
    for site, slots in qstate.items():
        for slot, st in slots.items():
            for leaf, arr in st.items():
                flat[f"{site}/{slot}/{leaf}"] = np.asarray(arr)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **flat)


def load_qstate(path) -> dict:
    data = np.load(Path(path), allow_pickle=False)
    qstate: dict = {}
    for key in data.files:
        site, slot, leaf = key.rsplit("/", 2)
        qstate.setdefault(site, {}).setdefault(slot, {})[leaf] = data[key]
    return qstate


# ---------------------------------------------------------------------------
# resumable calibration
# ---------------------------------------------------------------------------


class CalibCheckpointer:
    """Snapshot qstate after each reconstructed unit so a crashed
    calibration resumes where it stopped."""

    def __init__(self, run_dir):
        self.dir = Path(run_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.marker = self.dir / "calib_progress.json"

    def load(self) -> Tuple[Optional[dict], Optional[dict]]:
        if not self.marker.exists():
            return None, None
        progress = json.loads(self.marker.read_text())
        qstate = load_qstate(self.dir / "qstate_wip.npz")
        logger.info("resuming calibration from %s", progress)
        return qstate, progress

    def save(self, qstate: dict, phase: str, unit_idx: int) -> None:
        save_qstate(self.dir / "qstate_wip.npz", qstate)
        self.marker.write_text(json.dumps(
            {"phase": phase, "unit_idx": unit_idx}))

    def finalize(self, qstate: dict) -> None:
        save_qstate(self.dir / "qstate.npz", qstate)
        if self.marker.exists():
            self.marker.unlink()


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
