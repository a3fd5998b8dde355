#!/bin/bash
# Round-3 rev i: close out the conditional thread + end-of-round hygiene.
#
# rev-h trained sudoku+NLLOriginal and its first decode eval is in flight;
# this queue (which replaces rev-h's remaining stages) then attacks the
# conditional decode collapse with the mechanism found by the decode probe
# (docs/DESIGN_NOTES.md "the conditioning is dead"): trained suffix logits
# are BITWISE prefix-invariant — attention saturated exactly local under the
# sqrt(d_model) embedding scale. Fix under test: QK LayerNorm
# (model.qk_norm=True, now the pianoroll_cond preset default).
# [SUPERSEDED by this queue's own stage-2 probe: the measured mechanism is
#  distributed per-layer attenuation, not saturation, and the collapse
#  persists under qk_norm — see README "round 3i". Header kept as the
#  hypothesis this run was launched to test.]
#
#   1. wait for the in-flight sudoku_nll LBJF eval, run the preset-decode eval
#   2. layer-locality probe on the OLD (qk_norm=False) conditional ckpt —
#      pins WHERE the conditioning path dies
#   3. pianoroll_cond retrain with qk_norm=True (50k, same schedule as the
#      rev-g run for an apples-to-apples comparison) -> runs/pianoroll_cond_qk
#   4. decode probe + cond_mmd/scale_consistency evals on the new ckpt
#   5. full pytest suite (CPU; after ALL TPU work — 1 vCPU)
#   6. bench.py rewarm for the driver's end-of-round measurement
set -u
cd /root/repo
echo $$ > "/tmp/queue_gen.$$.pid"
trap 'rm -f "/tmp/queue_gen.$$.pid"' EXIT

TPU_END=${TPU_END:-1787163600}   # 18:20 UTC Aug 19
left() { echo $(( TPU_END - $(date +%s) )); }
note() { echo "queue(i): $* at $(date), left=$(left)s"; }

# ---- stage 0: wait for the in-flight sudoku_nll LBJF eval ----
while kill -0 "${WAIT_PID:-24909}" 2>/dev/null; do sleep 20; done
note "sudoku_nll lbjf eval drained"
echo $$ > /tmp/queue.pid

reap_trainer() {
    local P
    P=$(cat "/tmp/train_$1.pid" 2>/dev/null || true)
    [ -n "$P" ] && kill -9 "$P" 2>/dev/null
    sleep 3
}

# ---- stage 1: sudoku_nll preset-decode eval (rev-h stage 1 tail) ----
NDIR=$(ls -dt runs/sudoku_nll/*/*/checkpoints 2>/dev/null | head -1)
if [ -d "$NDIR/50000" ] && [ ! -s /tmp/sudoku_nll_eval_taul.log ]; then
    timeout 3600 python eval.py --preset sudoku --ckpt "$NDIR" \
        --step 50000 --metric sudoku_acc --samples 1024 --batch 256 \
        --set loss.name=NLLOriginal \
        > /tmp/sudoku_nll_eval_taul.log 2>&1
    note "sudoku_nll eval preset rc=$?"
fi

# ---- stage 2: locality probe on the OLD conditional checkpoint ----
ODIR=$(ls -dt runs/pianoroll_cond/*/*/checkpoints 2>/dev/null | head -1)
if [ -d "$ODIR/50000" ]; then
    timeout 1800 python scripts/cond_attention_probe.py --ckpt "$ODIR" \
        --step 50000 --set model.qk_norm=False \
        > /tmp/cond_attn_probe_old.log 2>&1
    note "old-ckpt locality probe rc=$?"
fi

# ---- stage 3: conditional retrain with qk_norm (preset default) ----
if ! ls -d runs/pianoroll_cond_qk/*/*/checkpoints/50000 >/dev/null 2>&1 \
        && [ "$(left)" -gt 6200 ]; then
    WATCHDOG_STALL=900 WATCHDOG_SAVE_ROOT=runs/pianoroll_cond_qk \
    timeout 3900 bash scripts/train_watchdog.sh \
        pianoroll_cond 50000 --iters 50000 \
        --set save_location=runs/pianoroll_cond_qk \
              sampler.sample_freq=50000 saving.checkpoint_freq=10000
    note "cond qk watchdog rc=$?"
    reap_trainer pianoroll_cond
fi

# ---- stage 4: decode probe + quality evals on the new checkpoint ----
QDIR=$(ls -dt runs/pianoroll_cond_qk/*/*/checkpoints 2>/dev/null | head -1)
QSTEP=$(ls "$QDIR" 2>/dev/null | sort -n | tail -1)
if [ -n "$QSTEP" ]; then
    timeout 1800 python scripts/cond_attention_probe.py --ckpt "$QDIR" \
        --step "$QSTEP" > /tmp/cond_attn_probe_qk.log 2>&1
    note "qk-ckpt locality probe rc=$?"
    timeout 2400 python scripts/cond_decode_probe.py --ckpt "$QDIR" \
        --step "$QSTEP" --out docs/assets/round3/cond_probe_qk \
        > /tmp/cond_probe_qk.log 2>&1
    note "qk decode probe rc=$?"
    timeout 2400 python eval.py --preset pianoroll_cond --ckpt "$QDIR" \
        --step "$QSTEP" --metric cond_mmd --samples 256 --batch 256 \
        --set sampler.name=ConditionalLBJF \
        > /tmp/cond_mmd_qk_lbjf.log 2>&1
    note "qk cond_mmd lbjf rc=$?"
    timeout 2400 python eval.py --preset pianoroll_cond --ckpt "$QDIR" \
        --step "$QSTEP" --metric cond_mmd --samples 256 --batch 256 \
        > /tmp/cond_mmd_qk_taul.log 2>&1
    note "qk cond_mmd preset rc=$?"
fi

# ---- stage 5: full pytest suite, after all TPU training ----
timeout 4500 python -m pytest tests/ -q > /tmp/pytest_full.log 2>&1
note "pytest rc=$? tail: $(tail -1 /tmp/pytest_full.log)"

# ---- stage 6: re-warm the compile cache for the driver's bench run ----
timeout 1800 python bench.py > /tmp/bench_rewarm.log 2>&1
note "bench rewarm rc=$?"
note "queue(i) done"
