#!/bin/bash
# SD-scale calibration on the real chip (reference flagship flow,
# txt2img.py:369-490). Round-5 invocation: same quant config as round 4
# (W4A8, sm16, split, running-stat, reduced iters 250/50) plus the
# residency fixes' flags. Cold cache dir unless CACHE= is overridden.
# RUN_DIR= resumes a crashed run from its calib_progress.json snapshot
# (reference temp-ckpt behavior, txt2img.py:422-428).
set -u
cd /root/repo
CACHE=${CACHE:-runs/xla_cache_sd_r5}
LOGDIR=${LOGDIR:-runs/logs_r5_sd}
LOG=${LOG:-$LOGDIR/calibrate_r5.log}
mkdir -p "$LOGDIR"
{ time python -m qdiffusion_tpu.cli \
    --compile-cache "$CACHE" \
    calibrate --task sd_v1 \
    --cali-data runs/sd_traj.npz \
    --weight-bit 4 --quant-act --act-bit 8 --sm-abit 16 --split \
    --running-stat \
    --cali-st 8 --cali-n 8 --cali-batch-size 4 \
    --cali-iters 250 --cali-iters-a 50 \
    --precompile 4 \
    --alpha-dtype bfloat16 \
    --capture-group-mb "${GROUP_MB:-2048}" \
    --act-init-batch "${ACT_INIT_BATCH:-4}" \
    ${RUN_DIR:+--run-dir "$RUN_DIR"} \
    --logdir "$LOGDIR" ; } >"$LOG" 2>&1
echo "EXIT=$?" >> "$LOG"
