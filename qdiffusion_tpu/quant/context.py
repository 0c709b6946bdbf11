"""QuantCtx — the functional replacement for in-place module surgery.

The reference framework rewires a torch model in place (QuantModel,
qdiff/quant_model.py) and stores quantizer tensors as module attributes. Here
a model's forward pass is a pure function, and every quantization site calls
into a `QuantCtx` threaded through it. The ctx dispatches on a static
`QuantMode`, reads quantizer state from one pytree, and (during calibration
passes) records freshly-initialized or EMA-updated states into an output
tree. Each distinct ctx configuration is a separate jit trace; the traced
computation itself is always static.

Site naming: every quantizable layer has a path-like name (mirroring the
torch state_dict names for checkpoint parity) and each quantizer at that
site has a slot: 'w' / 'w0' (weights; '0' = second split half), 'a' / 'a0'
(input activations), and block-level slots 'q' 'k' 'v' 'sm' for attention
matmul operands (reference quant_block.py:114-161, 333-386).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax.numpy as jnp

from qdiffusion_tpu.quant.adaround import adaround_quant
from qdiffusion_tpu.quant.affine import (
    AffineQuantizerSpec,
    ema_update,
    fake_quant,
    init_state,
)

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class QuantMode:
    """Static on/off switches (reference set_quant_state semantics)."""

    w: bool = False  # weight fake-quant active
    a: bool = False  # activation fake-quant active
    soft: bool = False  # AdaRound soft (training) vs hard (inference) rounding

    @classmethod
    def off(cls):
        return cls(False, False)


# collect modes
INIT = "init"  # first-batch scale init for act quantizers
EMA = "ema"  # running-stat momentum update
EMA_SM_ONLY = "ema_sm_only"  # update only post-softmax quantizers


class QuantCtx:
    """Threaded through a model forward; handles every quantizer site."""

    def __init__(self, qstate: Optional[dict] = None, mode: QuantMode = QuantMode.off(),
                 collect: Optional[str] = None, capture: Optional[str] = None,
                 engine: str = "sim", packed: Optional[dict] = None,
                 substitute: Optional[dict] = None,
                 differentiable: bool = False,
                 conv_stream: str = "auto"):
        self.qstate: dict = qstate or {}
        self.mode = mode
        self.collect = collect
        self.capture = capture  # block name whose (input, output) to record
        self.collected: Dict[str, dict] = {}
        self.captured: dict = {}
        # substitute: {unit name -> array}: the unit's output is replaced by
        # the given value (its own compute is dead code). Differentiating
        # the model output w.r.t. the substituted value gives the
        # block-output gradient — the functional form of the reference's
        # backward hook (GetLayerGrad, qdiff/utils.py:271-308).
        self.substitute: dict = substitute or {}
        # engine='sim': fake-quant simulation (calibration-time).
        # engine='int8': deployed integer kernels; `packed` maps layer name
        # -> PackedWeight (ops/int8.py). Layers without an entry fall back
        # to simulation.
        self.engine = engine
        self.packed: dict = packed or {}
        # conv_stream: 'auto' streams a packed conv only when the trace-time
        # byte cost model says the weight-bandwidth saving beats the patch
        # materialization (ops/qlayers.py::_stream_conv_profitable); 'all'
        # forces every packed conv through the streaming kernel (bench use).
        self.conv_stream = conv_stream
        # differentiable=True: this forward sits under jax.grad (block/act
        # reconstruction, Fisher capture) — models must keep to
        # differentiable ops (the Pallas flash-attention kernel defines no
        # VJP, so attention stays on the materializing path, matching the
        # reference's calibration-time semantics anyway).
        self.differentiable = differentiable

    # -- state access ------------------------------------------------------

    def _get(self, name: str, slot: str) -> Optional[dict]:
        layer = self.qstate.get(name)
        if layer is None:
            return None
        return layer.get(slot)

    def _put(self, name: str, slot: str, st: dict):
        self.collected.setdefault(name, {})[slot] = st

    # -- quantizer sites -----------------------------------------------------

    def weight_quant(self, name: str, slot: str, w: Array,
                     spec: AffineQuantizerSpec) -> Array:
        """Weight quantizer site. AdaRound when the state has an 'alpha' leaf;
        plain round-to-nearest uniform affine otherwise."""
        if not self.mode.w:
            return w
        st = self._get(name, slot)
        if st is None:
            # late init from the weight itself (weights are static, so this
            # happens at trace time and produces constants).
            st = init_state(w, spec)
            self._put(name, slot, st)
        if "alpha" in st:
            return adaround_quant(w, st, spec, soft=self.mode.soft)
        return fake_quant(w, st["delta"], st["zero_point"], spec)

    def act_quant(self, name: str, slot: str, x: Array,
                  spec: AffineQuantizerSpec) -> Array:
        """Activation quantizer site.

        collect=INIT: initialize delta/zp from this batch (reference
        first-forward init, quant_layer.py:68-75) and record it.
        collect=EMA/EMA_SM_ONLY: momentum-update recorded stats.
        """
        if self.collect == INIT:
            st = self._get(name, slot) or init_state(x, spec)
            self._put(name, slot, st)
        elif self.collect in (EMA, EMA_SM_ONLY):
            st = self._get(name, slot)
            if st is not None and (self.collect == EMA or slot == "sm"):
                st = ema_update(st, x, spec)
                self._put(name, slot, st)
        else:
            st = self._get(name, slot)
        if not self.mode.a:
            return x
        if st is None:
            return x
        return fake_quant(x, st["delta"], st["zero_point"], spec)

    def act_matmul(self, name: str, slot_a: str, slot_b: str, eq: str,
                   a, b, spec_a: AffineQuantizerSpec,
                   spec_b: AffineQuantizerSpec):
        """Quantized activation x activation einsum site (attention QK^T /
        weights x V). On the int8 engine with calibrated states and <=8-bit
        grids, runs the MXU in int8 (ops/int8.py::int8_einsum); otherwise
        fake-quants both operands and einsums — identical semantics.
        """
        st_a = self._get(name, slot_a)
        st_b = self._get(name, slot_b)
        import jax.numpy as jnp

        if (self.engine == "int8" and self.mode.a and self.collect is None
                and st_a is not None and st_b is not None
                and spec_a.n_bits <= 8 and spec_b.n_bits <= 8):
            from qdiffusion_tpu.ops.int8 import int8_einsum

            return int8_einsum(eq, a, b, st_a, st_b, spec_a, spec_b,
                               out_dtype=jnp.float32)
        aq = self.act_quant(name, slot_a, a, spec_a)
        bq = self.act_quant(name, slot_b, b, spec_b)
        return jnp.einsum(eq, aq, bq, preferred_element_type=jnp.float32)

    def get_state(self, name: str, slot: str) -> Optional[dict]:
        """Public read access to a quantizer's state (e.g. for fused kernels
        that take the calibrated deltas directly)."""
        return self._get(name, slot)

    # -- block capture -------------------------------------------------------

    def capture_io(self, name: str, inp, out):
        """Record a block's (input, output) when it is a capture target.

        `capture` is a single unit name or a collection of names (grouped
        capture, calib/capture.py::GroupedCapture — one compiled program
        captures several consecutive units, killing the per-unit compile
        wall of the reference's per-block hook scheme, qdiff/utils.py:18-149)."""
        if self.is_capture_target(name):
            self.captured[name] = {"inp": inp, "out": out}

    def is_capture_target(self, name: str) -> bool:
        cap = self.capture
        if cap is None:
            return False
        return name == cap if isinstance(cap, str) else name in cap
