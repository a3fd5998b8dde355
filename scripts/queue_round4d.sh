#!/bin/bash
# Round-4 rev d: the short-session (≈1h wall-clock) continuation after the
# third round-4 box rebuild (runs/ + compile cache wiped again; 4b/4c never
# executed on this box). One priority fits in an hour, so this queue runs
# exactly the 4b stage-1 pivot — the LAST open VERDICT directive:
#
#   1. pianoroll UNCONDITIONAL train (tauLDR's own piano protocol: train on
#      all positions with NLLOriginal, clamp the prefix only at sampling),
#      checkpoints every 10k, stopped at whatever checkpoint the clock
#      allows (target 40k of the 50k schedule).
#   2. clamped conditional decode eval (cond_mmd + rest-fraction +
#      scale_consistency) on the last checkpoint, EMA params,
#      ConditionalTauLeaping/1000 — the same protocol as the committed 5k
#      probe (docs/assets/round4/uncond_5k_condmmd.log) so the two numbers
#      compose into a trajectory.
#   3. evidence commit + README/PARITY writeup.
#
# Ops notes from this session (kept for the next rebuild):
#   - Cold train-step compile through the axon tunnel after a cache wipe is
#     ~9 min with ZERO log output and ~0% host CPU (server-side compile;
#     host blocks in futex). That pattern is NOT the wedge signature —
#     don't kill before ~10 min post-launch. The wedge check that works:
#     /proc/<pid>/task/*/comm shows llvm-worker / thread churn while
#     compiling; a wedged client shows only static futex_do_wait threads
#     AND a tiny side-client `jax.devices()` probe hangs too — but never
#     run that probe while a trainer is mid-compile, it queues behind it.
#   - Do NOT run pytest (or any CPU-heavy job) beside a compiling trainer
#     on this 1-vCPU host.
set -u
cd /root/repo
A=docs/assets/round4

# ---- stage 1: unconditional train (launched directly by the session) ----
# WATCHDOG_STALL=600 WATCHDOG_SAVE_ROOT=runs/pianoroll_uncond \
# timeout 2700 bash scripts/train_watchdog.sh pianoroll_cond 50000 \
#     --iters 50000 --set loss.name=NLLOriginal \
#     save_location=runs/pianoroll_uncond sampler.sample_freq=1000000 \
#     saving.checkpoint_freq=10000

# ---- stage 2: clamped conditional decode eval on the last checkpoint ----
UDIR=$(ls -dt runs/pianoroll_uncond/*/*/checkpoints 2>/dev/null | head -1)
USTEP=$(ls "$UDIR" 2>/dev/null | sort -n | tail -1)
if [ -n "$USTEP" ]; then
    cp /tmp/train_pianoroll_cond.log "$A/uncond_train.log" 2>/dev/null
    timeout 1800 python eval.py --preset pianoroll_cond --ckpt "$UDIR" \
        --step "$USTEP" --metric cond_mmd --samples 256 --batch 256 \
        --use-ema --set loss.name=NLLOriginal \
        > "$A/uncond_${USTEP}_condmmd_ema_taul.log" 2>&1
    echo "eval rc=$?"
    git add -A "$A" && git commit -q -m \
        "Round-4 evidence: unconditional-train pianoroll ${USTEP} + clamped conditional decode (EMA TauL)"
fi
