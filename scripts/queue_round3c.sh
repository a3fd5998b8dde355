#!/bin/bash
# Round-3 continuation chain (rev c): re-run the stages the stale-heartbeat
# deadman killed mid-flight at 13:09/13:50 (rev b log), plus the conditional
# retrain with the nll_weight fix from the all-rest-collapse diagnosis.
#
#   1. CIFAR10 50k quality trajectory (VERDICT r2 #7) — was killed at ~3k;
#      watchdog + snapshot collector + trained-feature FID trajectory.
#   2. pianoroll_cond 50k retrain with the escaped-marginal-basin loss
#      weighting (reads --set overrides from /tmp/cond_overrides when the
#      interactive session has decided them; skipped if absent) + cond_mmd.
#   3. If >4h left: sudoku continuation 50k->200k (fresh stream) for a
#      longer-horizon trajectory with the LBJF decode.
# Each stage logs to /tmp/<stage>.log.
set -u
cd /root/repo
echo $$ > "/tmp/queue_gen.$$.pid"
trap 'rm -f "/tmp/queue_gen.$$.pid"' EXIT
echo $$ > /tmp/queue.pid
ROUND_END=${ROUND_END:-1787104000}
left() { echo $(( ROUND_END - $(date +%s) )); }

# wait for the interactive diagnostic probe to release the chip
P=$(cat /tmp/diag.pid 2>/dev/null)
while [ -n "$P" ] && kill -0 "$P" 2>/dev/null; do sleep 20; done
echo "queue(c): probe done at $(date), left=$(left)s"

# ---- stage 1: CIFAR10 50k ----
echo "queue(c): cifar10 50k via watchdog at $(date)"
nohup bash scripts/snapshot_collector.sh 'runs/cifar10/*/*/checkpoints' \
    runs/cifar10_snapshots 5000 120 > /tmp/snapcol_cifar.log 2>&1 &
echo $! > /tmp/snapcol.pid
WATCHDOG_STALL=900 nohup bash scripts/train_watchdog.sh tauUnet_cifar10 50000 \
    --iters 50000 --set sampler.sample_freq=50000 saving.checkpoint_freq=2500 \
    > /tmp/watchdog_cifar.log 2>&1 &
echo $! > /tmp/watchdog.pid
W=0
while kill -0 "$(cat /tmp/watchdog.pid)" 2>/dev/null && [ "$W" -lt 16200 ]; do
    sleep 60; W=$((W+60))
done
kill "$(cat /tmp/watchdog.pid)" 2>/dev/null
TP=$(cat /tmp/train_tauUnet_cifar10.pid 2>/dev/null)
[ -n "$TP" ] && kill -9 "$TP" 2>/dev/null
sleep 135   # let the collector archive the final step
kill "$(cat /tmp/snapcol.pid)" 2>/dev/null
echo "queue(c): cifar train finished/capped at $(date), left=$(left)s"
ls runs/cifar10_snapshots 2>/dev/null

# ---- stage 2: pianoroll_cond retrain with fixed loss weighting ----
if [ -f /tmp/cond_overrides ] && [ "$(left)" -gt 9000 ]; then
    COND_SET=$(cat /tmp/cond_overrides)
    echo "queue(c): pianoroll_cond 50k with [$COND_SET] at $(date)"
    # shellcheck disable=SC2086
    WATCHDOG_STALL=900 nohup bash scripts/train_watchdog.sh pianoroll_cond 50000 \
        --iters 50000 --set sampler.sample_freq=50000 saving.checkpoint_freq=5000 \
        $COND_SET > /tmp/watchdog_cond.log 2>&1 &
    echo $! > /tmp/watchdog.pid
    W=0
    while kill -0 "$(cat /tmp/watchdog.pid)" 2>/dev/null && [ "$W" -lt 3600 ]; do
        sleep 60; W=$((W+60))
    done
    kill "$(cat /tmp/watchdog.pid)" 2>/dev/null
    TP=$(cat /tmp/train_pianoroll_cond.pid 2>/dev/null)
    [ -n "$TP" ] && kill -9 "$TP" 2>/dev/null
    sleep 5
    PDIR=$(ls -dt runs/pianoroll_cond/*/*/checkpoints 2>/dev/null | head -1)
    # shellcheck disable=SC2086
    timeout 1500 python eval.py --preset pianoroll_cond --ckpt "$PDIR" \
        --metric cond_mmd --samples 512 --batch 256 --set $COND_SET \
        > /tmp/cond_eval_fixed.log 2>&1
    echo "queue(c): cond eval rc=$? at $(date), left=$(left)s"
fi

# ---- stage 3: CIFAR FID trajectory (trained features) ----
STEPS=$(ls runs/cifar10_snapshots 2>/dev/null | sort -n | tr '\n' ',' | sed 's/,$//')
if [ -n "$STEPS" ]; then
    echo "queue(c): cifar fid trajectory over [$STEPS] at $(date)"
    timeout 9000 python scripts/fid_trajectory.py --preset tauUnet_cifar10 \
        --snapshots runs/cifar10_snapshots --steps "$STEPS" \
        --features trained --samples 512 --batch 256 \
        --out docs/assets/round3/cifar10_traj \
        > /tmp/cifar_traj.log 2>&1
    echo "queue(c): cifar trajectory rc=$? at $(date)"
    LAST=$(ls runs/cifar10_snapshots | sort -n | tail -1)
    timeout 5400 python scripts/fid_trajectory.py --preset tauUnet_cifar10 \
        --snapshots runs/cifar10_snapshots --steps "$LAST" \
        --features trained --samples 2048 --batch 256 \
        --out docs/assets/round3/cifar10_final \
        > /tmp/cifar_final.log 2>&1
    echo "queue(c): cifar final-point rc=$? at $(date), left=$(left)s"
fi

# ---- stage 4: sudoku continuation to 200k with the existing stream ----
if [ "$(left)" -gt 16000 ]; then
    echo "queue(c): sudoku continue ->200k at $(date)"
    WATCHDOG_STALL=900 nohup bash scripts/train_watchdog.sh sudoku 200000 \
        --iters 200000 --set sampler.sample_freq=200000 saving.checkpoint_freq=10000 \
        > /tmp/watchdog_sudoku2.log 2>&1 &
    echo $! > /tmp/watchdog.pid
    W=0
    while kill -0 "$(cat /tmp/watchdog.pid)" 2>/dev/null && [ "$W" -lt 13000 ]; do
        sleep 60; W=$((W+60))
    done
    kill "$(cat /tmp/watchdog.pid)" 2>/dev/null
    TP=$(cat /tmp/train_sudoku.pid 2>/dev/null)
    [ -n "$TP" ] && kill -9 "$TP" 2>/dev/null
    sleep 5
    SDIR=$(ls -dt runs/sudoku/*/*/checkpoints 2>/dev/null | head -1)
    SSTEP=$(ls "$SDIR" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
    timeout 1800 python eval.py --preset sudoku --ckpt "$SDIR" --step "$SSTEP" \
        --metric sudoku_acc --samples 1024 --batch 256 \
        --set sampler.name=LBJF \
        > /tmp/sudoku_eval_200k.log 2>&1
    echo "queue(c): sudoku 200k LBJF eval rc=$? at $(date)"
fi
echo "queue(c): chain complete at $(date), left=$(left)s"
