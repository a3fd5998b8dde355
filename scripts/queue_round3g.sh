#!/bin/bash
# Round-3 rev g: third box rebuild wiped runs/ + compile cache again; rev-f's
# stage 1 (maze 500k) completed and is committed, so rev-g re-plans with what
# is still missing:
#   1. sudoku full 400k fresh-stream from scratch + LBJF/preset decodes at
#      400k and an LBJF decode at 200k (VERDICT #1 final number)
#   2. pianoroll_cond 50k retrain (CondNLL + embedding scale) +
#      scripts/cond_decode_probe.py (the README-promised decode-collapse
#      probe) + cond_mmd evals incl. the ConditionalLBJF decode
#   3. bench.py once to re-warm the wiped compile cache before the driver's
#      end-of-round bench run
# Stage rules learned in rev a-f: watchdog in the FOREGROUND under timeout;
# reap by pidfile after each stage; never pattern-kill.
set -u
cd /root/repo
echo $$ > "/tmp/queue_gen.$$.pid"
trap 'rm -f "/tmp/queue_gen.$$.pid"' EXIT
echo $$ > /tmp/queue.pid

TPU_END=${TPU_END:-1787163600}   # 18:20 UTC Aug 19 — driver bench needs the chip
left() { echo $(( TPU_END - $(date +%s) )); }
note() { echo "queue(g): $* at $(date), left=$(left)s"; }

reap_trainer() {
    local P
    P=$(cat "/tmp/train_$1.pid" 2>/dev/null || true)
    [ -n "$P" ] && kill -9 "$P" 2>/dev/null
    sleep 3
}

# ---- stage 1: sudoku, full 400k reference schedule, fresh stream ----
if ! ls -d runs/sudoku/*/*/checkpoints/400000 >/dev/null 2>&1 \
        && [ "$(left)" -gt 20000 ]; then
    WATCHDOG_STALL=900 timeout 13000 bash scripts/train_watchdog.sh \
        sudoku 400000 \
        --set sampler.sample_freq=400000 saving.checkpoint_freq=20000
    note "sudoku watchdog rc=$?"
    reap_trainer sudoku
fi
SDIR=$(ls -dt runs/sudoku/*/*/checkpoints 2>/dev/null | head -1)
if [ -d "$SDIR/400000" ]; then
    timeout 3600 python eval.py --preset sudoku --ckpt "$SDIR" \
        --step 400000 --metric sudoku_acc --samples 1024 --batch 256 \
        --set sampler.name=LBJF \
        > /tmp/sudoku_eval_400k_lbjf.log 2>&1
    note "sudoku eval 400k lbjf rc=$?"
    timeout 3600 python eval.py --preset sudoku --ckpt "$SDIR" \
        --step 400000 --metric sudoku_acc --samples 1024 --batch 256 \
        > /tmp/sudoku_eval_400k_taul.log 2>&1
    note "sudoku eval 400k preset rc=$?"
fi
if [ -d "$SDIR/200000" ] && [ "$(left)" -gt 9000 ]; then
    timeout 2700 python eval.py --preset sudoku --ckpt "$SDIR" \
        --step 200000 --metric sudoku_acc --samples 1024 --batch 256 \
        --set sampler.name=LBJF \
        > /tmp/sudoku_eval_200k_lbjf.log 2>&1
    note "sudoku eval 200k lbjf rc=$?"
fi

# ---- stage 2: conditional retrain + decode probe ----
if ! ls -d runs/pianoroll_cond/*/*/checkpoints/50000 >/dev/null 2>&1 \
        && [ "$(left)" -gt 10000 ]; then
    WATCHDOG_STALL=900 timeout 5400 bash scripts/train_watchdog.sh \
        pianoroll_cond 50000 --iters 50000 \
        --set sampler.sample_freq=50000 saving.checkpoint_freq=10000
    note "cond watchdog rc=$?"
    reap_trainer pianoroll_cond
fi
PDIR=$(ls -dt runs/pianoroll_cond/*/*/checkpoints 2>/dev/null | head -1)
if [ -d "$PDIR/50000" ]; then
    timeout 2400 python scripts/cond_decode_probe.py --ckpt "$PDIR" \
        --step 50000 > /tmp/cond_probe.log 2>&1
    note "cond probe rc=$?"
    timeout 2400 python eval.py --preset pianoroll_cond --ckpt "$PDIR" \
        --step 50000 --metric cond_mmd --samples 256 --batch 256 \
        --set sampler.name=ConditionalLBJF \
        > /tmp/cond_mmd_lbjf.log 2>&1
    note "cond_mmd lbjf rc=$?"
    timeout 2400 python eval.py --preset pianoroll_cond --ckpt "$PDIR" \
        --step 50000 --metric cond_mmd --samples 256 --batch 256 \
        > /tmp/cond_mmd_taul.log 2>&1
    note "cond_mmd preset rc=$?"
fi

# ---- stage 3: re-warm the compile cache for the driver's bench run ----
timeout 3600 python bench.py > /tmp/bench_rewarm.log 2>&1
note "bench rewarm rc=$?"
note "queue(g) done"
