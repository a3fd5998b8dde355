#!/bin/bash
# Round-3 TPU chain (rev h): re-planned for the final ~4h of the round.
#
# Priority order after the flagship 600k checkpoint lands (VERDICT round-2
# directive numbers in parens):
#   1. interactive window — the driving session validates bench + /verify and
#      commits the held diff, then touches /tmp/window_done (25 min cap so an
#      absent driver can't stall the chain);
#   2. fid_stats 4096x3seeds x {MidPointTauL,TauL} trained features (#4) —
#      appends+flushes per cell and is --skip-done rerunnable, so even a
#      timeout leaves committed evidence;
#   3. CIFAR10 trajectory slot (#7), sized to what's left of the round;
#   4. pianoroll conditional 12k + cond_mmd (missing #5) if time;
#   5. synthetic_d3pm 10k + MMD (last family without trained evidence) if time.
# Each stage logs to /tmp/<stage>.log; the evidence harvester mirrors those
# into docs/assets/round3/ for the end-of-round commit.
set -u
cd /root/repo
ROUND_END=1787054050   # round start (PROGRESS.jsonl ts - wall_s) + 12h
left() { echo $(( ROUND_END - $(date +%s) )); }

echo "queue(h): waiting for flagship 600000 checkpoint"
while true; do
    RUN=$(ls -d runs/mnist_ll/*/*/checkpoints/600000 2>/dev/null | head -1)
    [ -n "$RUN" ] && break
    sleep 60
done
RUN=$(dirname "$RUN")
echo "queue(h): flagship done, ckpts at $RUN ($(date))"
P=$(cat /tmp/flagship.pid 2>/dev/null)
[ -n "$P" ] && for i in $(seq 1 30); do kill -0 "$P" 2>/dev/null || break; sleep 10; done
kill "$(cat /tmp/snapcol.pid)" 2>/dev/null
cp -r "$RUN/600000" runs/mnist_ll_snapshots/600000.tmp 2>/dev/null && \
    mv runs/mnist_ll_snapshots/600000.tmp runs/mnist_ll_snapshots/600000

echo "queue(h): waiting for window_done (cap 1500s) at $(date)"
W=0
while [ ! -f /tmp/window_done ] && [ "$W" -lt 1500 ]; do sleep 30; W=$((W+30)); done

echo "queue(h): starting fid_stats at $(date), left=$(left)s"
# 5700s: two cold 1000-step sampler compiles (10-20 min each, post-rebuild
# cache) can precede the ~27 min of sampling; fid_stats is the round's top
# evidence priority, so it may consume the CIFAR/cond slots (guards below).
timeout 5700 python scripts/fid_stats.py --preset tauUnet_mnist_ll \
    --snapshots "$RUN" --step 600000 --samples 4096 --seeds 3 \
    --samplers MidPointTauL,TauL --features trained \
    --out runs/mnist_ll_fid_stats > /tmp/fid_stats.log 2>&1
echo "queue(h): fid_stats rc=$? at $(date)"

# CIFAR slot: as far as the round allows, leaving ~40 min for its own eval
# plus the cond/d3pm tail.
CIFAR_T=$(( $(left) - 2400 )); [ "$CIFAR_T" -gt 3000 ] && CIFAR_T=3000
if [ "$CIFAR_T" -gt 600 ]; then
    echo "queue(h): starting cifar10 train (timeout ${CIFAR_T}s) at $(date)"
    timeout "$CIFAR_T" python train.py --preset tauUnet_cifar10 --iters 50000 \
        --auto-resume \
        --set sampler.sample_freq=50000 saving.checkpoint_freq=2500 \
        > /tmp/cifar.log 2>&1
    echo "queue(h): cifar train rc=$?"
    CDIR=$(ls -dt runs/cifar10/*/*/checkpoints 2>/dev/null | head -1)
    timeout 900 python eval.py --preset tauUnet_cifar10 --ckpt "$CDIR" \
        --metric fid --features trained --samples 1024 --batch 256 \
        > /tmp/cifar_eval.log 2>&1
    echo "queue(h): cifar eval rc=$? at $(date)"
fi

if [ "$(left)" -gt 1500 ]; then
    echo "queue(h): starting pianoroll_cond 12k at $(date), left=$(left)s"
    timeout 900 python train.py --preset pianoroll_cond --iters 12000 \
        --set saving.checkpoint_freq=12000 sampler.sample_freq=12000 \
        > /tmp/cond.log 2>&1
    echo "queue(h): cond train rc=$?"
    PDIR=$(ls -dt runs/pianoroll_cond/*/*/checkpoints 2>/dev/null | head -1)
    timeout 600 python eval.py --preset pianoroll_cond --ckpt "$PDIR" \
        --metric cond_mmd --samples 512 --batch 256 \
        > /tmp/cond_eval.log 2>&1
    echo "queue(h): cond eval rc=$? at $(date)"
fi

if [ "$(left)" -gt 800 ]; then
    echo "queue(h): starting synthetic_d3pm 10k at $(date), left=$(left)s"
    timeout 450 python train.py --preset synthetic_d3pm --iters 10000 \
        --set saving.checkpoint_freq=10000 sampler.sample_freq=10000 \
        > /tmp/d3pm.log 2>&1
    echo "queue(h): d3pm train rc=$?"
    DDIR=$(ls -dt runs/synthetic_d3pm/*/*/checkpoints 2>/dev/null | head -1)
    timeout 300 python eval.py --preset synthetic_d3pm --ckpt "$DDIR" \
        --metric mmd --samples 2048 > /tmp/d3pm_eval.log 2>&1
    echo "queue(h): d3pm eval rc=$? at $(date)"
fi
echo "queue(h): chain complete at $(date), left=$(left)s"
