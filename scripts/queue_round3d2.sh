#!/bin/bash
# Round-3 rev d2: stages 4-6 of rev d, relaunched after the rev-d cond stage
# no-opped — the watchdog's done-condition (checkpoint <target> under ANY run
# of the preset) matched the archived all-rest-collapse run's 50000, so it
# exited without training. The collapsed runs now live in
# runs/archive/pianoroll_cond_collapsed_2026-08-18; this chain retrains
# pianoroll_cond from scratch under the fixed preset defaults
# (CondNLL + scale_input_embedding), then runs the CIFAR FID stages and the
# bf16 repro.
set -u
cd /root/repo
echo $$ > "/tmp/queue_gen.$$.pid"
trap 'rm -f "/tmp/queue_gen.$$.pid"' EXIT
echo $$ > /tmp/queue.pid
ROUND_END=${ROUND_END:-1787104000}
left() { echo $(( ROUND_END - $(date +%s) )); }

# ---- stage 4: pianoroll_cond retrain with the collapse fix ----
if [ "$(left)" -gt 7200 ]; then
    WATCHDOG_STALL=600 nohup bash scripts/train_watchdog.sh pianoroll_cond 50000 \
        --iters 50000 --set sampler.sample_freq=50000 saving.checkpoint_freq=5000 \
        > /tmp/watchdog_cond.log 2>&1 &
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
    PSTEP=$(ls "$PDIR" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
    timeout 1800 python eval.py --preset pianoroll_cond --ckpt "$PDIR" \
        --step "$PSTEP" --metric cond_mmd --samples 512 --batch 256 \
        > /tmp/cond_eval_condnll.log 2>&1
    echo "queue(d2): cond eval rc=$? step=$PSTEP at $(date), left=$(left)s"
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
    echo "queue(d2): cifar final-point rc=$? at $(date), left=$(left)s"
fi
if [ "$(left)" -gt 4200 ]; then
    # 6 points spanning the run (full 11-point set only if time turns out
    # cheap); leave >=2700s for the bf16 stage
    STEPS="2500,12500,22500,32500,42500,50000"
    timeout $(( $(left) - 2700 )) python scripts/fid_trajectory.py \
        --preset tauUnet_cifar10 \
        --snapshots runs/cifar10_snapshots --steps "$STEPS" \
        --features trained --samples 512 --batch 64 \
        --out docs/assets/round3/cifar10_traj \
        > /tmp/cifar_traj.log 2>&1
    echo "queue(d2): cifar trajectory rc=$? at $(date), left=$(left)s"
fi

# ---- stage 6: bf16 scan compile-crash repro (solo; mode=repro crashes the
# TPU client by design, so it goes last and is followed by a pool probe) ----
if [ "$(left)" -gt 2400 ]; then
    for MODE in small remat f32 repro; do
        echo "=== mode=$MODE $(date) ===" >> /tmp/bf16_repro.log
        timeout 900 python scripts/bf16_scan_repro.py --mode "$MODE" \
            >> /tmp/bf16_repro.log 2>&1
        echo "queue(d2): bf16 mode=$MODE rc=$? at $(date)"
    done
    sleep 60
    timeout 120 python -c "import jax; print('pool probe:', jax.devices())" \
        >> /tmp/bf16_repro.log 2>&1
    echo "queue(d2): post-repro pool probe rc=$? at $(date)"
fi
echo "queue(d2): chain complete at $(date), left=$(left)s"
