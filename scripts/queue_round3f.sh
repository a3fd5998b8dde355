#!/bin/bash
# Round-3 rev f: the box rebuilt AGAIN after rev-e was queued (runs/ wiped,
# rev-e never executed), so rev-f re-plans against zero checkpoints:
#   1. maze full 500k stream_fresh from scratch + LBJF/200 and preset decode
#      evals at 500k (VERDICT #2 final number)
#   2. pianoroll_cond 50k retrain (CondNLL + embedding scale) +
#      scripts/cond_decode_probe.py (the README-promised decode-collapse
#      probe) + cond_mmd evals incl. the new ConditionalLBJF decode
#   3. sudoku full 400k fresh-stream from scratch + LBJF/preset decodes
#      (VERDICT #1 final number)
#   4. bench.py once to re-warm the wiped compile cache before the driver's
#      end-of-round bench run
# Stage rules learned in rev a-e: watchdog in the FOREGROUND under timeout;
# reap by pidfile after each stage; never pattern-kill.
set -u
cd /root/repo
echo $$ > "/tmp/queue_gen.$$.pid"
trap 'rm -f "/tmp/queue_gen.$$.pid"' EXIT
echo $$ > /tmp/queue.pid

TPU_END=${TPU_END:-1787140800}   # 12:00 UTC Aug 19 — room for pytest + docs
left() { echo $(( TPU_END - $(date +%s) )); }
note() { echo "queue(f): $* at $(date), left=$(left)s"; }

reap_trainer() {
    local P
    P=$(cat "/tmp/train_$1.pid" 2>/dev/null || true)
    [ -n "$P" ] && kill -9 "$P" 2>/dev/null
    sleep 3
}

# ---- stage 1: maze, full 500k reference schedule, stream_fresh ----
if ! ls -d runs/maze_unet/*/*/checkpoints/500000 >/dev/null 2>&1 \
        && [ "$(left)" -gt 24000 ]; then
    WATCHDOG_STALL=900 timeout 14400 bash scripts/train_watchdog.sh \
        tauUnet_maze 500000 \
        --set sampler.sample_freq=500000 saving.checkpoint_freq=25000
    note "maze watchdog rc=$?"
    reap_trainer tauUnet_maze
fi
MDIR=$(ls -dt runs/maze_unet/*/*/checkpoints 2>/dev/null | head -1)
if [ -d "$MDIR/500000" ] && [ ! -f /tmp/maze_eval_500k_lbjf.log ]; then
    timeout 2700 python eval.py --preset tauUnet_maze --ckpt "$MDIR" \
        --step 500000 --metric maze_acc --samples 1024 --batch 256 \
        --set sampler.name=LBJF sampler.num_steps=200 \
        > /tmp/maze_eval_500k_lbjf.log 2>&1
    note "maze eval lbjf/200 rc=$?"
    timeout 3600 python eval.py --preset tauUnet_maze --ckpt "$MDIR" \
        --step 500000 --metric maze_acc --samples 1024 --batch 256 \
        > /tmp/maze_eval_500k_taul.log 2>&1
    note "maze eval preset rc=$?"
fi

# ---- stage 2: conditional retrain + decode probe ----
if ! ls -d runs/pianoroll_cond/*/*/checkpoints/50000 >/dev/null 2>&1 \
        && [ "$(left)" -gt 16000 ]; then
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
fi

# ---- stage 3: sudoku, full 400k reference schedule, fresh stream ----
if ! ls -d runs/sudoku/*/*/checkpoints/400000 >/dev/null 2>&1 \
        && [ "$(left)" -gt 13000 ]; then
    WATCHDOG_STALL=900 timeout $(( $(left) - 6200 )) bash scripts/train_watchdog.sh \
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
    note "sudoku eval lbjf rc=$?"
    timeout 3600 python eval.py --preset sudoku --ckpt "$SDIR" \
        --step 400000 --metric sudoku_acc --samples 1024 --batch 256 \
        > /tmp/sudoku_eval_400k_taul.log 2>&1
    note "sudoku eval preset rc=$?"
fi

# ---- stage 4: re-warm the compile cache for the driver's bench run ----
timeout 3600 python bench.py > /tmp/bench_rewarm.log 2>&1
note "bench rewarm rc=$?"
note "queue(f) done"
