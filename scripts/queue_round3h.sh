#!/bin/bash
# Round-3 rev h: objective-ceiling probe for sudoku + end-of-round hygiene.
#
# The 400k fresh-stream sudoku run (rev-g) pins the final number for the
# reference recipe (CTElbo, nll_weight=1e-3). Its README analysis claims the
# remaining gap to near-perfect DDSM-lineage sudoku is a *model/objective*
# ceiling, not a data artifact. rev-h tests the objective half of that claim
# directly: train the same net/process/schedule with the CE-primary
# L_ll objective (NLLOriginal — the reference's winning MNIST recipe,
# README.md:163) for 50k iters and decode with the known-best cell
# (LBJF/1000/EMA). Comparable baseline: CTElbo fresh-stream at 50k decodes
# 23.4% (docs/assets/round3/sudoku_decode_sweep.jsonl).
#
#   1. wait for the rev-g queue to drain (single TPU chip)
#   2. preserve rev-g's sudoku trainer log (rev-h clobbers /tmp/train_sudoku.log)
#   3. sudoku + NLLOriginal, 50k iters, fresh stream -> runs/sudoku_nll
#   4. LBJF/1000/EMA + preset TauL decodes at 50k (n=1024)
#   5. full pytest suite (CPU; only after ALL TPU training is done — 1 vCPU)
set -u
cd /root/repo
echo $$ > "/tmp/queue_gen.$$.pid"
trap 'rm -f "/tmp/queue_gen.$$.pid"' EXIT

TPU_END=${TPU_END:-1787163600}   # 18:20 UTC Aug 19
left() { echo $(( TPU_END - $(date +%s) )); }
note() { echo "queue(h): $* at $(date), left=$(left)s"; }

# ---- stage 0: wait for rev-g ----
GPID=$(cat /tmp/queue.pid 2>/dev/null || true)
while [ -n "$GPID" ] && kill -0 "$GPID" 2>/dev/null; do
    sleep 60
done
note "rev-g drained"
echo $$ > /tmp/queue.pid

mkdir -p docs/assets/round3/queue_logs
cp -f /tmp/train_sudoku.log docs/assets/round3/queue_logs/sudoku_400k_train.log 2>/dev/null

reap_trainer() {
    local P
    P=$(cat "/tmp/train_$1.pid" 2>/dev/null || true)
    [ -n "$P" ] && kill -9 "$P" 2>/dev/null
    sleep 3
}

# ---- stage 1: sudoku + NLLOriginal (L_ll), 50k ----
if ! ls -d runs/sudoku_nll/*/*/checkpoints/50000 >/dev/null 2>&1 \
        && [ "$(left)" -gt 9000 ]; then
    WATCHDOG_STALL=900 WATCHDOG_SAVE_ROOT=runs/sudoku_nll \
    timeout 4500 bash scripts/train_watchdog.sh \
        sudoku 50000 --iters 50000 \
        --set save_location=runs/sudoku_nll loss.name=NLLOriginal \
              sampler.sample_freq=50000 saving.checkpoint_freq=10000
    note "sudoku_nll watchdog rc=$?"
    reap_trainer sudoku
fi
NDIR=$(ls -dt runs/sudoku_nll/*/*/checkpoints 2>/dev/null | head -1)
if [ -d "$NDIR/50000" ]; then
    timeout 3600 python eval.py --preset sudoku --ckpt "$NDIR" \
        --step 50000 --metric sudoku_acc --samples 1024 --batch 256 \
        --set loss.name=NLLOriginal sampler.name=LBJF \
        > /tmp/sudoku_nll_eval_lbjf.log 2>&1
    note "sudoku_nll eval lbjf rc=$?"
    timeout 3600 python eval.py --preset sudoku --ckpt "$NDIR" \
        --step 50000 --metric sudoku_acc --samples 1024 --batch 256 \
        --set loss.name=NLLOriginal \
        > /tmp/sudoku_nll_eval_taul.log 2>&1
    note "sudoku_nll eval preset rc=$?"
fi

# ---- stage 2: full pytest suite, after all TPU training ----
timeout 3600 python -m pytest tests/ -q > /tmp/pytest_full.log 2>&1
note "pytest rc=$? tail: $(tail -1 /tmp/pytest_full.log)"
note "queue(h) done"
