#!/bin/bash
# SD-scale sampling with the round-5 CALIBRATED qstate — the back half of
# the reference's flagship txt2img story (txt2img.py:490-589): prompt ->
# CLIP -> CFG PLMS-50 -> VAE decode, quantization ON, on one v5e chip.
# Two deployments of the same calibrated qstate:
#   fold  — W4 weights folded into bf16 params (our production engine;
#           should hold the 0.90 img/s bf16 headline)
#   sim   — W4A8 fake-quant simulation (the reference's own deployment
#           style, qdiff/quant_layer.py:66-89) with act quant + sm16
# Same warm compile cache as the calibration run.
set -u
cd /root/repo
QSTATE=${QSTATE:-runs/logs_r5_sd/calib-sd_v1-2026-08-19-23-10-00/qstate.npz}
CACHE=${CACHE:-runs/xla_cache_sd_r5}
LOGDIR=${LOGDIR:-runs/logs_r5_sd}
mkdir -p "$LOGDIR"

common=(--task sd_v1
        --qstate "$QSTATE" --split
        --token-ids runs/sd_assets/toks.npz
        --clip-ckpt runs/sd_assets/clip.npz
        --n 8 --batch 4 --seed 42)

{ time python -m qdiffusion_tpu.cli --compile-cache "$CACHE" sample \
    "${common[@]}" \
    --weight-bit 4 --engine fold --dtype bfloat16 \
    --out "$LOGDIR/samples_w4_fold" \
    --npz-out "$LOGDIR/samples_w4_fold" ; } \
    > "$LOGDIR/sample_w4_fold.log" 2>&1
echo "EXIT=$?" >> "$LOGDIR/sample_w4_fold.log"

{ time python -m qdiffusion_tpu.cli --compile-cache "$CACHE" sample \
    "${common[@]}" \
    --weight-bit 4 --quant-act --act-bit 8 --sm-abit 16 \
    --engine sim --dtype bfloat16 \
    --out "$LOGDIR/samples_w4a8_sim" \
    --npz-out "$LOGDIR/samples_w4a8_sim" ; } \
    > "$LOGDIR/sample_w4a8_sim.log" 2>&1
echo "EXIT=$?" >> "$LOGDIR/sample_w4a8_sim.log"
