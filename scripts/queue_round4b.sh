#!/bin/bash
# Round-4 rev b: the post-rebuild execution queue (box rebuilt 2026-08-20,
# runs/ + compile cache lost; evidence from the first round-4 session is
# committed under docs/assets/round4/).
#
# Stages, in VERDICT-priority order:
#   1. pianoroll UNCONDITIONAL 50k train (the round-4 pivot: tauLDR's own
#      piano protocol — train on all positions, clamp the prefix only at
#      sampling; the 5k probe already broke the bitwise collapse) + clamped
#      conditional decode evals (EMA + raw, TauL + LBJF) + decode probe.
#   2. sudoku NLLOriginal 50k retrain (ckpt lost to the rebuild; 16 min)
#      + the three-probe corrector-collapse decomposition (VERDICT #5).
#   3. maze tauUnet 500k fresh-stream retrain + maze_acc under the new
#      preset decode LBJF/200 and the reference TauL/1000 (VERDICT #6).
#   4. mnist_d3pm long run (VERDICT #7) for the remaining TPU budget,
#      checkpoints every 25k, then a trained-feature FID trajectory.
#   5. full pytest (CPU) + bench.py compile-cache rewarm for the driver.
#
# Evidence lands in docs/assets/round4/ and is committed per stage so a
# mid-run box rebuild cannot destroy results again.
set -u
cd /root/repo
echo $$ > "/tmp/queue_gen.$$.pid"
trap 'rm -f "/tmp/queue_gen.$$.pid"' EXIT
echo $$ > /tmp/queue.pid

# TPU budget end (epoch secs). Default: 9.5h from launch, leaving ~1.5h of
# session for pytest/bench/writeups.
TPU_END=${TPU_END:-$(( $(date +%s) + 34200 ))}
left() { echo $(( TPU_END - $(date +%s) )); }
note() { echo "queue(4b): $* at $(date), left=$(left)s"; }
A=docs/assets/round4

commit_evidence() {
    git add -A "$A" && git commit -q -m "$1" && note "committed: $1"
}

reap_trainer() {
    local P
    P=$(cat "/tmp/train_$1.pid" 2>/dev/null || true)
    [ -n "$P" ] && kill -9 "$P" 2>/dev/null
    sleep 3
}

# ---- stage 0: wait for any in-flight TPU work (roofline/bf16, interactive) ----
while [ -f /tmp/tpu_busy ]; do sleep 15; done
note "TPU free, starting stage 1"

# ---- stage 1: pianoroll unconditional 50k + clamped conditional decode ----
if ! ls -d runs/pianoroll_uncond/*/*/checkpoints/50000 >/dev/null 2>&1; then
    WATCHDOG_STALL=600 WATCHDOG_SAVE_ROOT=runs/pianoroll_uncond \
    timeout 4500 bash scripts/train_watchdog.sh pianoroll_cond 50000 \
        --iters 50000 \
        --set loss.name=NLLOriginal save_location=runs/pianoroll_uncond \
              sampler.sample_freq=1000000 saving.checkpoint_freq=10000 \
        > /tmp/queue_uncond_train.log 2>&1
    note "uncond 50k watchdog rc=$?"
    reap_trainer pianoroll_cond
fi
UDIR=$(ls -dt runs/pianoroll_uncond/*/*/checkpoints 2>/dev/null | head -1)
USTEP=$(ls "$UDIR" 2>/dev/null | sort -n | tail -1)
if [ -n "$USTEP" ]; then
    cp /tmp/train_pianoroll_cond.log "$A/uncond_50k_train.log" 2>/dev/null
    for variant in "ema taul" "ema lbjf" "raw taul"; do
        set -- $variant; P=$1; SMP=$2
        EMAFLAG="--use-ema"; [ "$P" = raw ] && EMAFLAG="--no-use-ema"
        SSET=""; [ "$SMP" = lbjf ] && SSET="sampler.name=ConditionalLBJF"
        timeout 2700 python eval.py --preset pianoroll_cond --ckpt "$UDIR" \
            --step "$USTEP" --metric cond_mmd --samples 256 --batch 256 \
            $EMAFLAG --set loss.name=NLLOriginal $SSET \
            > "$A/uncond_${USTEP}_condmmd_${P}_${SMP}.log" 2>&1
        note "uncond cond_mmd $P $SMP rc=$?"
    done
    timeout 2700 python scripts/cond_decode_probe.py --ckpt "$UDIR" \
        --step "$USTEP" --out "$A/uncond_probe" \
        --set loss.name=NLLOriginal \
        > "$A/uncond_${USTEP}_decode_probe.log" 2>&1
    note "uncond decode probe rc=$?"
    commit_evidence "Round-4 evidence: unconditional-train pianoroll ${USTEP} + clamped conditional decode"
fi

# ---- stage 2: sudoku 50k retrain + corrector decomposition ----
if ! ls -d runs/sudoku/*/*/checkpoints/50000 >/dev/null 2>&1 \
        && [ "$(left)" -gt 25000 ]; then
    WATCHDOG_STALL=600 timeout 3600 bash scripts/train_watchdog.sh \
        sudoku 50000 --iters 50000 \
        --set sampler.sample_freq=1000000 saving.checkpoint_freq=10000 \
        > /tmp/queue_sudoku_train.log 2>&1
    note "sudoku 50k watchdog rc=$?"
    reap_trainer sudoku
fi
SDIR=$(ls -dt runs/sudoku/*/*/checkpoints 2>/dev/null | head -1)
SSTEP=$(ls "$SDIR" 2>/dev/null | sort -n | tail -1)
if [ -n "$SSTEP" ]; then
    timeout 5400 python scripts/diag_sudoku_corrector.py --ckpt "$SDIR" \
        --step "$SSTEP" --n 256 --out "$A/sudoku_corrector_diag.jsonl" \
        > "$A/sudoku_corrector_diag.log" 2>&1
    note "sudoku corrector diag rc=$?"
    commit_evidence "Round-4 evidence: sudoku corrector decomposition probes on the ${SSTEP} NLL checkpoint"
fi

# ---- stage 3: maze 500k fresh-stream retrain + new-preset decode metric ----
if ! ls -d runs/tauUnet_maze/*/*/checkpoints/500000 >/dev/null 2>&1 \
        && [ "$(left)" -gt 21000 ]; then
    # snapshot every 120k so the long-horizon decline (VERDICT weak #5:
    # 44.5% at 240k -> ~40% at 500k) can be re-measured under the new
    # preset decode on THIS run's own mid checkpoints
    nohup bash scripts/snapshot_collector.sh 'runs/tauUnet_maze/*/*/checkpoints' \
        runs/maze_snapshots 120000 120 > /tmp/maze_snapshots.log 2>&1 &
    MSNAP_PID=$!
    WATCHDOG_STALL=600 timeout 9000 bash scripts/train_watchdog.sh \
        tauUnet_maze 500000 \
        --set sampler.sample_freq=1000000 saving.checkpoint_freq=20000 \
        > /tmp/queue_maze_train.log 2>&1
    note "maze 500k watchdog rc=$?"
    reap_trainer tauUnet_maze
    kill "$MSNAP_PID" 2>/dev/null
fi
MDIR=$(ls -dt runs/tauUnet_maze/*/*/checkpoints 2>/dev/null | head -1)
MSTEP=$(ls "$MDIR" 2>/dev/null | sort -n | tail -1)
if [ -n "$MSTEP" ]; then
    cp /tmp/train_tauUnet_maze.log "$A/maze_500k_train.log" 2>/dev/null
    timeout 2700 python eval.py --preset tauUnet_maze --ckpt "$MDIR" \
        --step "$MSTEP" --metric maze_acc --samples 512 --batch 256 \
        > "$A/maze_${MSTEP}_acc_preset_lbjf200.log" 2>&1
    note "maze acc preset(LBJF/200) rc=$?"
    timeout 3600 python eval.py --preset tauUnet_maze --ckpt "$MDIR" \
        --step "$MSTEP" --metric maze_acc --samples 512 --batch 256 \
        --set sampler.name=TauL sampler.num_steps=1000 sampler.is_ordinal=True \
        > "$A/maze_${MSTEP}_acc_taul1000.log" 2>&1
    note "maze acc TauL/1000 rc=$?"
    # long-horizon decline: same preset decode on each archived mid snapshot
    for SNAP in $(ls runs/maze_snapshots 2>/dev/null | sort -n); do
        [ "$SNAP" = "$MSTEP" ] && continue
        timeout 2700 python eval.py --preset tauUnet_maze \
            --ckpt runs/maze_snapshots --step "$SNAP" \
            --metric maze_acc --samples 512 --batch 256 \
            > "$A/maze_${SNAP}_acc_preset_lbjf200.log" 2>&1
        note "maze acc snapshot $SNAP rc=$?"
    done
    commit_evidence "Round-4 evidence: maze ${MSTEP} retrain, preset LBJF/200 vs TauL/1000 decode + mid-snapshot trajectory"
fi

# ---- stage 4: mnist_d3pm for the remaining TPU budget ----
D3PM_BUDGET=$(( $(left) - 1800 ))
if [ "$D3PM_BUDGET" -gt 3600 ]; then
    nohup bash scripts/snapshot_collector.sh 'runs/mnist_d3pm/*/*/checkpoints' \
        runs/d3pm_snapshots 25000 120 > /tmp/d3pm_snapshots.log 2>&1 &
    SNAP_PID=$!
    WATCHDOG_STALL=600 timeout "$D3PM_BUDGET" bash scripts/train_watchdog.sh \
        mnist_d3pm 600000 \
        --set sampler.sample_freq=1000000 saving.checkpoint_freq=5000 \
        > /tmp/queue_d3pm_train.log 2>&1
    note "mnist_d3pm watchdog rc=$? (budget ${D3PM_BUDGET}s)"
    reap_trainer mnist_d3pm
    kill "$SNAP_PID" 2>/dev/null
fi
DRUN=$(ls -dt runs/mnist_d3pm/*/*/checkpoints 2>/dev/null | head -1)
DSTEP=$(ls "$DRUN" 2>/dev/null | sort -n | tail -1)
if [ -n "$DSTEP" ]; then
    cp /tmp/train_mnist_d3pm.log "$A/mnist_d3pm_train.log" 2>/dev/null
    # make sure the final step is in the snapshot dir for the trajectory
    [ -d "runs/d3pm_snapshots/$DSTEP" ] || cp -r "$DRUN/$DSTEP" "runs/d3pm_snapshots/$DSTEP"
    timeout 7200 python scripts/fid_trajectory.py --preset mnist_d3pm \
        --snapshots runs/d3pm_snapshots --samples 512 --batch 128 \
        --out "$A/mnist_d3pm_fid_traj" \
        > "$A/mnist_d3pm_fid_traj.log" 2>&1
    note "mnist_d3pm fid trajectory rc=$?"
    timeout 2700 python eval.py --preset mnist_d3pm --ckpt "$DRUN" \
        --step "$DSTEP" --metric save_samples --samples 64 --batch 64 \
        --out "$A/mnist_d3pm_samples_${DSTEP}.npy" \
        > "$A/mnist_d3pm_samples.log" 2>&1
    note "mnist_d3pm sample grid rc=$?"
    commit_evidence "Round-4 evidence: MNIST D3PM trained to ${DSTEP}, FID trajectory + samples"
fi

# ---- stage 5: full pytest (CPU) + bench rewarm ----
timeout 4500 python -m pytest tests/ -q > /tmp/pytest_full.log 2>&1
note "pytest rc=$? tail: $(tail -1 /tmp/pytest_full.log)"
cp /tmp/pytest_full.log "$A/pytest_full_round4.log"
timeout 2400 python bench.py > /tmp/bench_rewarm.log 2>&1
note "bench rewarm rc=$? $(grep -o '{.*}' /tmp/bench_rewarm.log | tail -1)"
commit_evidence "Round-4 evidence: full pytest log + bench rewarm"
note "queue(4b) done"
