#!/bin/bash
# Round-3 rev d3: remaining stages of rev d2, relaunched after d2 stalled in
# its watchdog wait-loop — the watchdog was launched as a direct child of the
# queue and never reaped, so after it exited `kill -0 <pid>` kept succeeding
# on the ZOMBIE until the 3600s cap. (Lesson: wait on children or check
# /proc/<pid>/stat state, not bare kill -0.) The cond retrain itself finished
# (50000 ckpt present); this chain runs eval + CIFAR FID + bf16 repro only.
set -u
cd /root/repo
echo $$ > "/tmp/queue_gen.$$.pid"
trap 'rm -f "/tmp/queue_gen.$$.pid"' EXIT
echo $$ > /tmp/queue.pid
ROUND_END=${ROUND_END:-1787104000}
left() { echo $(( ROUND_END - $(date +%s) )); }

# ---- stage 4b: cond_mmd eval of the fixed-preset retrain ----
PDIR=runs/pianoroll_cond/2026-08-18/pianoroll_cond_22-13-11/checkpoints
timeout 1800 python eval.py --preset pianoroll_cond --ckpt "$PDIR" \
    --step 50000 --metric cond_mmd --samples 512 --batch 256 \
    > /tmp/cond_eval_condnll.log 2>&1
echo "queue(d3): cond eval rc=$? at $(date), left=$(left)s"

# ---- stage 5: CIFAR trained-feature FID, final point then trajectory ----
CDIR=$(ls -dt runs/cifar10/*/*/checkpoints 2>/dev/null | head -1)
if [ -d "$CDIR/50000" ] && [ ! -d runs/cifar10_snapshots/50000 ]; then
    cp -r "$CDIR/50000" runs/cifar10_snapshots/50000
fi
if [ "$(left)" -gt 3900 ]; then
    timeout 2700 python scripts/fid_trajectory.py --preset tauUnet_cifar10 \
        --snapshots runs/cifar10_snapshots --steps 50000 \
        --features trained --samples 2048 --batch 64 \
        --out docs/assets/round3/cifar10_final \
        > /tmp/cifar_final.log 2>&1
    echo "queue(d3): cifar final-point rc=$? at $(date), left=$(left)s"
fi
if [ "$(left)" -gt 4200 ]; then
    STEPS="2500,12500,22500,32500,42500,50000"
    timeout $(( $(left) - 2700 )) python scripts/fid_trajectory.py \
        --preset tauUnet_cifar10 \
        --snapshots runs/cifar10_snapshots --steps "$STEPS" \
        --features trained --samples 512 --batch 64 \
        --out docs/assets/round3/cifar10_traj \
        > /tmp/cifar_traj.log 2>&1
    echo "queue(d3): cifar trajectory rc=$? at $(date), left=$(left)s"
fi

# ---- stage 6: bf16 scan compile-crash repro (solo, last: mode=repro crashes
# the TPU client by design; followed by a pool probe) ----
if [ "$(left)" -gt 2400 ]; then
    for MODE in small remat f32 repro; do
        echo "=== mode=$MODE $(date) ===" >> /tmp/bf16_repro.log
        timeout 900 python scripts/bf16_scan_repro.py --mode "$MODE" \
            >> /tmp/bf16_repro.log 2>&1
        echo "queue(d3): bf16 mode=$MODE rc=$? at $(date)"
    done
    sleep 60
    timeout 120 python -c "import jax; print('pool probe:', jax.devices())" \
        >> /tmp/bf16_repro.log 2>&1
    echo "queue(d3): post-repro pool probe rc=$? at $(date)"
fi
echo "queue(d3): chain complete at $(date), left=$(left)s"
