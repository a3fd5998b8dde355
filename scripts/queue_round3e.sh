#!/bin/bash
# Round-3 rev e: the round got a ~12h extension past the rev-d3 queue's
# planned end, so the big-ticket items deferred for time become feasible:
#   1. cond_decode_probe (CPU) — the decode-collapse diagnosis README promises
#   2. maze full 500k stream_fresh schedule + best-cell decode evals
#      (VERDICT #2 asked for maze_acc >= 45% at the FULL schedule; the 44.5%
#      round-3 number was measured on the round-2 240k checkpoint)
#   3. sudoku resume 121.6k -> 400k (full reference schedule, fresh-stream)
#      + LBJF/preset decode evals (VERDICT #1 final number)
#   4. CIFAR10 resume 50k -> as far as the clock allows + final FID point
# Stages run the trainer watchdog in the FOREGROUND under `timeout` (the d2
# zombie lesson: never poll `kill -0` on an unreaped child) and kill any
# surviving trainer via its pidfile after each stage.
set -u
cd /root/repo
echo $$ > "/tmp/queue_gen.$$.pid"
trap 'rm -f "/tmp/queue_gen.$$.pid"' EXIT
echo $$ > /tmp/queue.pid

TPU_END=${TPU_END:-1787136000}   # 10:40 UTC — leave room for pytest + docs
left() { echo $(( TPU_END - $(date +%s) )); }
note() { echo "queue(e): $* at $(date), left=$(left)s"; }

reap_trainer() {  # $1 = preset
    local P
    P=$(cat "/tmp/train_$1.pid" 2>/dev/null || true)
    [ -n "$P" ] && kill -9 "$P" 2>/dev/null
    sleep 3
}

# ---- stage 0: wait for the rev-d3 queue (CIFAR traj + bf16 repro) ----
OLD=${OLD_QUEUE_PID:-7630}
while [ -d "/proc/$OLD" ] && ! grep -q ' Z ' "/proc/$OLD/stat" 2>/dev/null; do
    sleep 30
done
note "rev-d3 queue gone"
sleep 30   # let the TPU client pool settle after the bf16 crash repro

# ---- stage 1: conditional decode probe (CPU-only, TPU idle) ----
PDIR=runs/pianoroll_cond/2026-08-18/pianoroll_cond_22-13-11/checkpoints
timeout 2400 python scripts/cond_decode_probe.py --ckpt "$PDIR" --step 50000 \
    > /tmp/cond_probe.log 2>&1
note "cond probe rc=$?"

# ---- stage 2: maze, full 500k reference schedule with stream_fresh ----
if [ "$(left)" -gt 23000 ]; then
    WATCHDOG_STALL=900 timeout 10800 bash scripts/train_watchdog.sh \
        tauUnet_maze 500000 \
        --set sampler.sample_freq=500000 saving.checkpoint_freq=25000
    note "maze watchdog rc=$?"
    reap_trainer tauUnet_maze
    # decode evals on the final checkpoint: best sweep cell + shipped preset
    MDIR=$(ls -dt runs/maze/*/*/checkpoints 2>/dev/null | head -1)
    if [ -d "$MDIR/500000" ]; then
        timeout 2700 python eval.py --preset tauUnet_maze --ckpt "$MDIR" \
            --step 500000 --metric maze_acc --samples 1024 --batch 256 \
            --set sampler.name=LBJF sampler.num_steps=200 \
            > /tmp/maze_eval_500k_lbjf.log 2>&1
        note "maze eval lbjf rc=$?"
        timeout 2700 python eval.py --preset tauUnet_maze --ckpt "$MDIR" \
            --step 500000 --metric maze_acc --samples 1024 --batch 256 \
            > /tmp/maze_eval_500k_taul.log 2>&1
        note "maze eval taul rc=$?"
    fi
fi

# ---- stage 3: sudoku resume 121.6k -> 400k (preset default n_iters) ----
if [ "$(left)" -gt 13000 ]; then
    WATCHDOG_STALL=900 timeout $(( $(left) - 6200 )) bash scripts/train_watchdog.sh \
        sudoku 400000 \
        --set sampler.sample_freq=400000 saving.checkpoint_freq=20000
    note "sudoku watchdog rc=$?"
    reap_trainer sudoku
    SDIR=$(ls -dt runs/sudoku/*/*/checkpoints 2>/dev/null | head -1)
    if [ -d "$SDIR/400000" ]; then
        timeout 2700 python eval.py --preset sudoku --ckpt "$SDIR" \
            --step 400000 --metric sudoku_acc --samples 1024 --batch 256 \
            --set sampler.name=LBJF \
            > /tmp/sudoku_eval_400k_lbjf.log 2>&1
        note "sudoku eval lbjf rc=$?"
        timeout 2700 python eval.py --preset sudoku --ckpt "$SDIR" \
            --step 400000 --metric sudoku_acc --samples 1024 --batch 256 \
            > /tmp/sudoku_eval_400k_taul.log 2>&1
        note "sudoku eval taul rc=$?"
    fi
fi

# ---- stage 4: CIFAR10 resume past 50k for whatever time remains ----
# ~5.3 steps/s measured; reserve 3000s for the final FID point.
if [ "$(left)" -gt 6000 ]; then
    TARGET=$(( 50000 + ( $(left) - 3000 ) * 5 ))
    TARGET=$(( TARGET / 10000 * 10000 ))
    if [ "$TARGET" -gt 50000 ]; then
        note "cifar resume to $TARGET"
        WATCHDOG_STALL=900 timeout $(( $(left) - 3000 )) bash scripts/train_watchdog.sh \
            tauUnet_cifar10 "$TARGET" --iters "$TARGET" \
            --set sampler.sample_freq=500000 saving.checkpoint_freq=10000
        note "cifar watchdog rc=$?"
        reap_trainer tauUnet_cifar10
        CDIR=$(ls -dt runs/cifar10/*/*/checkpoints 2>/dev/null | head -1)
        LAST=$(ls "$CDIR" 2>/dev/null | sort -n | tail -1)
        if [ -n "$LAST" ] && [ "$LAST" -gt 50000 ]; then
            cp -r "$CDIR/$LAST" "runs/cifar10_snapshots/$LAST" 2>/dev/null
            timeout 2700 python scripts/fid_trajectory.py \
                --preset tauUnet_cifar10 --snapshots runs/cifar10_snapshots \
                --steps "$LAST" --features trained --samples 2048 --batch 64 \
                --out docs/assets/round3/cifar10_ext \
                > /tmp/cifar_ext_fid.log 2>&1
            note "cifar ext fid rc=$? (step $LAST)"
        fi
    fi
fi
note "queue(e) done"
