#!/bin/bash
# Round-3 continuation chain (rev d): the stages after the sudoku->200k
# continuation relaunched at 21:13 (the rev-c chain was deadman-killed at
# 17:24 when the driving session went away mid-round).
#
#   1. Wait for the sudoku watchdog to exit (200k checkpoint reached).
#   2. Sudoku 200k decode: LBJF/1000/EMA (the 50k sweep winner) + preset
#      TauL for the same-checkpoint comparison.
#   3. Targeted pytest of this session's new code (CondNLL loss, embedding
#      scale flag, preset defaults) — TPU idle, so CPU contention is moot.
#   4. pianoroll_cond 50k retrain with the collapse fix (CondNLL +
#      scale_input_embedding, now preset defaults) + cond_mmd eval.
#   5. CIFAR10 trained-feature FID: final point (step 50000, 2048 samples)
#      then the 11-point trajectory — batch 64 (batch 256 OOMed: 768M
#      u32[256,3072,256] HLO temp in the categorical draw, rev-c logs).
#   6. bf16 1000-step-scan compile-crash repro re-capture (solo on the
#      chip, never beside a trainer).
# Each stage logs to /tmp/<stage>.log.
set -u
cd /root/repo
echo $$ > "/tmp/queue_gen.$$.pid"
trap 'rm -f "/tmp/queue_gen.$$.pid"' EXIT
echo $$ > /tmp/queue.pid
ROUND_END=${ROUND_END:-1787104000}
left() { echo $(( ROUND_END - $(date +%s) )); }

# ---- stage 1: wait for the sudoku watchdog ----
W=$(cat /tmp/watchdog.pid 2>/dev/null)
while [ -n "$W" ] && kill -0 "$W" 2>/dev/null; do sleep 30; done
TP=$(cat /tmp/train_sudoku.pid 2>/dev/null)
[ -n "$TP" ] && kill -9 "$TP" 2>/dev/null
echo "queue(d): sudoku watchdog done at $(date), left=$(left)s"

# ---- stage 2: sudoku 200k decode evals ----
SDIR=$(ls -dt runs/sudoku/*/*/checkpoints 2>/dev/null | head -1)
SSTEP=$(ls "$SDIR" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
echo "queue(d): sudoku eval ckpt=$SDIR step=$SSTEP at $(date)"
timeout 1800 python eval.py --preset sudoku --ckpt "$SDIR" --step "$SSTEP" \
    --metric sudoku_acc --samples 1024 --batch 256 \
    --set sampler.name=LBJF \
    > /tmp/sudoku_eval_200k_lbjf.log 2>&1
echo "queue(d): sudoku LBJF eval rc=$? at $(date)"
timeout 1800 python eval.py --preset sudoku --ckpt "$SDIR" --step "$SSTEP" \
    --metric sudoku_acc --samples 1024 --batch 256 \
    > /tmp/sudoku_eval_200k_taul.log 2>&1
echo "queue(d): sudoku TauL eval rc=$? at $(date), left=$(left)s"

# ---- stage 3: targeted pytest of the session's new code (TPU idle) ----
timeout 1200 python -m pytest tests/test_conditional.py tests/test_networks.py \
    tests/test_pianoroll_standin.py -q > /tmp/pytest_r3d.log 2>&1
echo "queue(d): targeted pytest rc=$? at $(date)"

# ---- stage 4: pianoroll_cond retrain with the collapse fix ----
if [ "$(left)" -gt 7200 ]; then
    WATCHDOG_STALL=600 nohup bash scripts/train_watchdog.sh pianoroll_cond 50000 \
        --iters 50000 --set sampler.sample_freq=50000 saving.checkpoint_freq=5000 \
        > /tmp/watchdog_cond.log 2>&1 &
    echo $! > /tmp/watchdog.pid
    W=0
    while kill -0 "$(cat /tmp/watchdog.pid)" 2>/dev/null && [ "$W" -lt 3300 ]; do
        sleep 60; W=$((W+60))
    done
    kill "$(cat /tmp/watchdog.pid)" 2>/dev/null
    TP=$(cat /tmp/train_pianoroll_cond.pid 2>/dev/null)
    [ -n "$TP" ] && kill -9 "$TP" 2>/dev/null
    sleep 5
    PDIR=$(ls -dt runs/pianoroll_cond/*/*/checkpoints 2>/dev/null | head -1)
    PSTEP=$(ls "$PDIR" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
    timeout 1800 python eval.py --preset pianoroll_cond --ckpt "$PDIR" \
        --step "$PSTEP" --metric cond_mmd --samples 512 --batch 256 \
        > /tmp/cond_eval_condnll.log 2>&1
    echo "queue(d): cond eval rc=$? step=$PSTEP at $(date), left=$(left)s"
fi

# ---- stage 5: CIFAR trained-feature FID, final point then trajectory ----
CDIR=$(ls -dt runs/cifar10/*/*/checkpoints 2>/dev/null | head -1)
if [ -d "$CDIR/50000" ] && [ ! -d runs/cifar10_snapshots/50000 ]; then
    cp -r "$CDIR/50000" runs/cifar10_snapshots/50000
fi
if [ "$(left)" -gt 3600 ]; then
    timeout 3600 python scripts/fid_trajectory.py --preset tauUnet_cifar10 \
        --snapshots runs/cifar10_snapshots --steps 50000 \
        --features trained --samples 2048 --batch 64 \
        --out docs/assets/round3/cifar10_final \
        > /tmp/cifar_final.log 2>&1
    echo "queue(d): cifar final-point rc=$? at $(date), left=$(left)s"
fi
if [ "$(left)" -gt 4200 ]; then
    STEPS=$(ls runs/cifar10_snapshots | sort -n | tr '\n' ',' | sed 's/,$//')
    timeout $(( $(left) - 1500 )) python scripts/fid_trajectory.py \
        --preset tauUnet_cifar10 \
        --snapshots runs/cifar10_snapshots --steps "$STEPS" \
        --features trained --samples 512 --batch 64 \
        --out docs/assets/round3/cifar10_traj \
        > /tmp/cifar_traj.log 2>&1
    echo "queue(d): cifar trajectory rc=$? at $(date), left=$(left)s"
fi

# ---- stage 6: bf16 scan compile-crash repro (solo; mode=repro crashes the
# TPU client by design, so it goes last and is followed by a pool probe) ----
if [ "$(left)" -gt 2400 ]; then
    for MODE in small remat f32 repro; do
        echo "=== mode=$MODE $(date) ===" >> /tmp/bf16_repro.log
        timeout 900 python scripts/bf16_scan_repro.py --mode "$MODE" \
            >> /tmp/bf16_repro.log 2>&1
        echo "queue(d): bf16 mode=$MODE rc=$? at $(date)"
    done
    sleep 60
    timeout 120 python -c "import jax; print('pool probe:', jax.devices())" \
        >> /tmp/bf16_repro.log 2>&1
    echo "queue(d): post-repro pool probe rc=$? at $(date)"
fi
echo "queue(d): chain complete at $(date), left=$(left)s"
