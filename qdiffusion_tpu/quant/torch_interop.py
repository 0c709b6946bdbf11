"""Import the reference's calibrated torch checkpoints into native qstate.

The reference publishes calibrated models as ``QuantModel.state_dict()``
files (saved after Parameter-izing quantizer tensors,
scripts/sample_diffusion_ddim.py:223-234) and reloads them with the
two-phase ``resume_cali_model`` dance (qdiff/utils.py:382-457). This module
replaces that dance with a single pure conversion: torch quantizer keys ->
the one qstate pytree {site: {slot: {delta, zero_point[, alpha]}}}.

Key mapping (torch module attr -> qstate slot):

  weight_quantizer    -> w      weight_quantizer_0 -> w0   (split halves)
  act_quantizer       -> a      act_quantizer_0    -> a0
  act_quantizer_q/k/v -> q/k/v  act_quantizer_w    -> sm

Sites keep the torch dotted module path (our registries use the same
names); the leading ``model.`` QuantModel prefix is stripped. Weight-side
tensors transpose from torch layouts to ours (OIHW->HWIO conv, OI->IO
dense, OIL->LIO conv1d) using the model's per-layer ``in_axis``.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_SLOT_MARKERS = [  # order matters: longest/most specific first
    (".weight_quantizer_0.", "w0"),
    (".weight_quantizer.", "w"),
    (".act_quantizer_0.", "a0"),
    (".act_quantizer_q.", "q"),
    (".act_quantizer_k.", "k"),
    (".act_quantizer_v.", "v"),
    (".act_quantizer_w.", "sm"),
    (".act_quantizer.", "a"),
]

_WEIGHT_SLOTS = ("w", "w0")

# torch -> ours axis permutations, keyed by tensor rank (torch saves
# per-channel delta/zero_point at full weight rank, e.g. (O,1,1,1), so the
# rank alone determines the layout):
#   conv2d OIHW -> HWIO; conv1d OIL -> LIO; dense OI -> IO
_PERMS = {4: (2, 3, 1, 0), 3: (2, 1, 0), 2: (1, 0)}


def split_reference_ckpt(sd: Dict[str, np.ndarray]) -> Tuple[dict, dict]:
    """Partition a QuantModel state_dict into (fp_weights, quantizer_keys).

    fp_weights keeps the wrapped modules' weight/bias (usable with
    torch_import.state_dict_to_pytree); org_weight shadow buffers are
    dropped (QuantModule keeps the pristine copy separately)."""
    fp, quant = {}, {}
    for k, v in sd.items():
        if "_quantizer" in k:
            quant[k] = v
        elif ".org_weight" in k or ".org_bias" in k:
            continue
        else:
            fp[k] = v
    return fp, quant


def _strip_model_prefix(key: str) -> str:
    # QuantModel wraps the UNet as self.model (qdiff/quant_model.py)
    return key[len("model."):] if key.startswith("model.") else key


def _convert_weight_tensor(v: np.ndarray) -> np.ndarray:
    perm = _PERMS.get(v.ndim)
    return np.transpose(v, perm) if perm is not None else v


def import_reference_qstate(sd: Dict[str, np.ndarray], model,
                            strict: bool = True) -> dict:
    """QuantModel.state_dict() (as numpy, e.g. via load_torch_checkpoint)
    -> native qstate pytree for `model`.

    Reproduces resume_cali_model semantics (qdiff/utils.py:382-457): weight
    quantizers arrive as AdaRound (delta/zero_point/alpha), activation
    quantizers as UniformAffine (delta/zero_point); hard rounding at
    inference falls out of running the imported state with soft=False."""
    layer_cfgs = model.layer_cfgs
    qstate: dict = {}
    unknown = []
    for key, v in sd.items():
        hit = next(((m, s) for m, s in _SLOT_MARKERS if m in key), None)
        if hit is None:
            continue
        marker, slot = hit
        path = _strip_model_prefix(key)
        site, leaf = path.split(marker.rstrip("."), 1)
        site = site.rstrip(".")
        leaf = leaf.lstrip(".")
        if leaf not in ("delta", "zero_point", "alpha"):
            logger.debug("skipping quantizer leaf %s", key)
            continue
        v = np.asarray(v, dtype=np.float32)
        if slot in _WEIGHT_SLOTS:
            if site not in layer_cfgs:
                unknown.append(site)
                continue
            v = _convert_weight_tensor(v)
        elif v.size == 1:
            v = v.reshape(())
        qstate.setdefault(site, {}).setdefault(slot, {})[leaf] = v
    if unknown and strict:
        raise KeyError(
            f"checkpoint has weight quantizers for sites the model doesn't "
            f"register: {sorted(set(unknown))[:5]}... "
            f"({len(set(unknown))} total) — wrong --task or --split?")
    # split-consistency: a split ckpt carries w0 halves whose deltas cover
    # only w[:, :split] — applying them to an unsplit weight is silently
    # wrong (and vice versa the split model would crash late).
    mismatched = [
        site for site, slots in qstate.items()
        if "w" in slots and site in layer_cfgs
        and bool(layer_cfgs[site].split) != ("w0" in slots)]
    if mismatched and strict:
        raise ValueError(
            f"split mismatch between checkpoint and model at "
            f"{mismatched[:5]} ({len(mismatched)} sites) — pass/drop --split "
            f"to match the checkpoint's calibration")
    # quantizers saved before zero_point was Parameter-ized lack the key;
    # default it to 0 (the symmetric/always_zero case stores int 0).
    for site, slots in qstate.items():
        for slot, st in slots.items():
            if "delta" in st and "zero_point" not in st:
                st["zero_point"] = np.zeros_like(st["delta"])
    n_w = sum(1 for s in qstate.values() for k in s if k in _WEIGHT_SLOTS)
    n_a = sum(1 for s in qstate.values() for k in s if k not in _WEIGHT_SLOTS)
    logger.info("imported reference qstate: %d weight quantizers, "
                "%d act quantizers over %d sites", n_w, n_a, len(qstate))
    return qstate


def import_reference_checkpoint(path, model, *,
                                want_params: bool = False,
                                strict: bool = True
                                ) -> Tuple[dict, Optional[dict]]:
    """Load a calibrated reference ckpt file -> (qstate[, fp param pytree])."""
    from qdiffusion_tpu.utils.checkpoints import load_torch_checkpoint

    sd = load_torch_checkpoint(path)
    fp, quant = split_reference_ckpt(sd)
    qstate = import_reference_qstate(quant, model, strict=strict)
    params = None
    if want_params:
        from qdiffusion_tpu.models.torch_import import state_dict_to_pytree

        params = state_dict_to_pytree(fp)
    return qstate, params
