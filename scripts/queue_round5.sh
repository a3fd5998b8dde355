#!/bin/bash
# Round-5 execution queue — every VERDICT r4 directive that needs TPU time,
# in priority order, evidence committed per stage. Round-4 lessons encoded:
# commits GATED on the stage producing real output (ADVICE r4 #3),
# checkpoint-dir selection skips empty dirs (ADVICE r4 #4), crash-prone
# bf16 scan repro runs LAST.
#
# Stage map (conditional thread first — VERDICT #1):
#   1  full conditional closing matrix over 20k-50k (validation already run
#      interactively: the 50k model is bitwise input-invariant — h(t))
#   1b dense-snapshot retrain 0->20k (ckpt every 1000) + collapse-trajectory
#      probe: pinpoint WHERE input-dependence dies (5k probe had structure,
#      loss dipped 3.27 @13-15k, 20k+ is at the marginal plateau 3.55)
#   1c mitigation probes x2 (lr 5e-5, dropout 0): same 20k + trajectory;
#      if either holds input-dependence to 20k, promote to a full decode demo
#   2  bf16 B=256 train-step regression repro (VERDICT #7b — cheap, safe)
#   3  sudoku NLLOriginal 50k retrain + corrector decomposition (VERDICT #2)
#   4  maze 500k fresh-stream retrain w/ 60k snapshots + decline
#      decomposition (VERDICT #3; re-validates the LBJF/200 preset flip)
#   5  EBM 3k + MMD (quick), then mnist_d3pm time-boxed + FID trajectory
#      (VERDICT #4), then protein 100k + MMD (VERDICT #5)
#   6  bin_mnist_hollow with leftovers (depth)
#   7  bf16 1000-step scan crash repro (LAST — may down the TPU worker)
set -u
cd /root/repo
echo $$ > "/tmp/queue_gen.$$.pid"
trap 'rm -f "/tmp/queue_gen.$$.pid"' EXIT
echo $$ > /tmp/queue5.pid

TPU_END=${TPU_END:-$(( $(date +%s) + 23400 ))}   # default 6.5h TPU budget
left() { echo $(( TPU_END - $(date +%s) )); }
note() { echo "queue(5): $* at $(date), left=$(left)s"; }
A=docs/assets/round5
mkdir -p "$A"

commit_evidence() {   # commit_evidence <msg> <must-exist-file> [grep-pattern]
    local msg="$1" f="$2" pat="${3:-}"
    if [ ! -s "$f" ]; then note "NOT committing ($f empty/missing): $msg"; return 1; fi
    if [ -n "$pat" ] && ! grep -q "$pat" "$f"; then
        note "NOT committing ($f lacks /$pat/): $msg"; return 1; fi
    git add -A "$A" && git commit -q -m "$msg" && note "committed: $msg"
}

reap_trainer() {
    local P
    P=$(cat "/tmp/train_$1.pid" 2>/dev/null || true)
    [ -n "$P" ] && kill -9 "$P" 2>/dev/null
    sleep 3
}

newest_nonempty_ckpts() {
    local d
    for d in $(ls -dt $1 2>/dev/null); do
        if [ -n "$(ls "$d" 2>/dev/null | grep '^[0-9]*$')" ]; then
            echo "$d"; return 0
        fi
    done
    return 1
}

# ---- stage 1: full conditional matrix (ckpt dir assembled interactively) ----
MX=runs/pianoroll_matrix_ckpts
if [ -d "$MX" ] && [ ! -s "$A/cond_matrix.jsonl" ]; then
    STEPS=$(ls "$MX" | sort -n | tr '\n' ',' | sed 's/,$//')
    timeout 9000 python scripts/cond_matrix.py --ckpt "$MX" \
        --steps "$STEPS" --n 256 --num-steps 1000 \
        --out "$A/cond_matrix.jsonl" > "$A/cond_matrix.log" 2>&1
    note "full matrix rc=$?"
    commit_evidence \
        "Round-5 evidence: conditional closing matrix (free-run + input-sensitivity + {raw,ema}x{TauL,LBJF}x{clean,noised-prefix} decode over 20k-50k)" \
        "$A/cond_matrix.jsonl" '"kind": "cond_decode"'
fi

# ---- stage 1b: dense-snapshot retrain + collapse trajectory ----
if [ "$(left)" -gt 3600 ] && [ ! -s "$A/collapse_traj.jsonl" ]; then
    if [ ! -d runs/pianoroll_dense_snaps ] || [ -z "$(ls runs/pianoroll_dense_snaps 2>/dev/null)" ]; then
        nohup bash scripts/snapshot_collector.sh 'runs/pianoroll_dense/*/*/checkpoints' \
            runs/pianoroll_dense_snaps 1000 15 > /tmp/dense_snaps.log 2>&1 &
        SNAP_PID=$!
        WATCHDOG_STALL=420 WATCHDOG_SAVE_ROOT=runs/pianoroll_dense \
        timeout 2700 bash scripts/train_watchdog.sh pianoroll_cond 20000 \
            --iters 20000 --set loss.name=NLLOriginal \
            save_location=runs/pianoroll_dense sampler.sample_freq=1000000 \
            saving.checkpoint_freq=1000 \
            > /tmp/queue_dense_train.log 2>&1
        note "dense 20k watchdog rc=$?"
        reap_trainer pianoroll_cond
        kill "$SNAP_PID" 2>/dev/null
        DDIR=$(newest_nonempty_ckpts 'runs/pianoroll_dense/*/*/checkpoints')
        for s in $(ls "$DDIR" 2>/dev/null | grep '^[0-9]*$'); do
            [ -d "runs/pianoroll_dense_snaps/$s" ] || cp -r "$DDIR/$s" "runs/pianoroll_dense_snaps/$s"
        done
    fi
    timeout 5400 python scripts/cond_collapse_trajectory.py \
        --snapshots runs/pianoroll_dense_snaps \
        --out "$A/collapse_traj.jsonl" > "$A/collapse_traj.log" 2>&1
    note "collapse trajectory rc=$?"
    commit_evidence \
        "Round-5 evidence: pianoroll marginal-collapse trajectory (dense 1k snapshots, CE vs marginal floor, prefix/suffix TV, decode note_frac)" \
        "$A/collapse_traj.jsonl" '"kind": "traj"'
fi

# ---- stage 1c: mitigation probes ----
run_mitigation() {   # run_mitigation <tag> <save_root> <extra --set args...>
    local TAG="$1" ROOT="$2"; shift 2
    [ -s "$A/collapse_traj_${TAG}.jsonl" ] && return 0
    nohup bash scripts/snapshot_collector.sh "$ROOT/*/*/checkpoints" \
        "${ROOT}_snaps" 2000 20 > "/tmp/${TAG}_snaps.log" 2>&1 &
    local SNAP_PID=$!
    WATCHDOG_STALL=420 WATCHDOG_SAVE_ROOT="$ROOT" \
    timeout 2700 bash scripts/train_watchdog.sh pianoroll_cond 20000 \
        --iters 20000 --set loss.name=NLLOriginal save_location="$ROOT" \
        sampler.sample_freq=1000000 saving.checkpoint_freq=2000 "$@" \
        > "/tmp/queue_${TAG}_train.log" 2>&1
    note "mitigation $TAG watchdog rc=$?"
    reap_trainer pianoroll_cond
    kill "$SNAP_PID" 2>/dev/null
    local DDIR
    DDIR=$(newest_nonempty_ckpts "$ROOT/*/*/checkpoints")
    for s in $(ls "$DDIR" 2>/dev/null | grep '^[0-9]*$'); do
        [ -d "${ROOT}_snaps/$s" ] || cp -r "$DDIR/$s" "${ROOT}_snaps/$s"
    done
    timeout 3600 python scripts/cond_collapse_trajectory.py \
        --snapshots "${ROOT}_snaps" \
        --overrides loss.name=NLLOriginal "$@" \
        --out "$A/collapse_traj_${TAG}.jsonl" > "$A/collapse_traj_${TAG}.log" 2>&1
    note "trajectory $TAG rc=$?"
    commit_evidence \
        "Round-5 evidence: pianoroll collapse mitigation probe ($TAG) — 20k train + trajectory" \
        "$A/collapse_traj_${TAG}.jsonl" '"kind": "traj"'
}

if [ "$(left)" -gt 7200 ]; then
    run_mitigation lr5e5 runs/pianoroll_mitA optimizer.lr=5e-5
fi
if [ "$(left)" -gt 7200 ]; then
    run_mitigation nodrop runs/pianoroll_mitB model.dropout=0.0
fi

# ---- stage 2: bf16 train regression repro (safe, cheap, a directive) ----
if [ ! -s "$A/bf16_train_regression.log" ]; then
    timeout 1800 python scripts/bf16_train_regression_repro.py \
        > "$A/bf16_train_regression.log" 2>&1
    note "bf16 train regression rc=$?"
    commit_evidence \
        "Round-5 evidence: bf16 B=256 train-step regression repro with version stamps" \
        "$A/bf16_train_regression.log" 'VERDICT'
fi

# ---- stage 3: sudoku retrain + corrector decomposition ----
if [ "$(left)" -gt 3600 ] && [ ! -s "$A/sudoku_corrector_diag.jsonl" ]; then
    if ! ls -d runs/sudoku/*/*/checkpoints/50000 >/dev/null 2>&1; then
        WATCHDOG_STALL=600 timeout 3600 bash scripts/train_watchdog.sh \
            sudoku 50000 --iters 50000 \
            --set sampler.sample_freq=1000000 saving.checkpoint_freq=10000 \
            > /tmp/queue_sudoku_train.log 2>&1
        note "sudoku 50k watchdog rc=$?"
        reap_trainer sudoku
    fi
    SDIR=$(newest_nonempty_ckpts 'runs/sudoku/*/*/checkpoints')
    SSTEP=$(ls "$SDIR" 2>/dev/null | grep '^[0-9]*$' | sort -n | tail -1)
    if [ -n "$SSTEP" ]; then
        cp /tmp/train_sudoku.log "$A/sudoku_train.log" 2>/dev/null
        timeout 5400 python scripts/diag_sudoku_corrector.py --ckpt "$SDIR" \
            --step "$SSTEP" --n 256 --out "$A/sudoku_corrector_diag.jsonl" \
            > "$A/sudoku_corrector_diag.log" 2>&1
        note "sudoku corrector diag rc=$?"
        commit_evidence \
            "Round-5 evidence: sudoku corrector collapse decomposition (churn vs model-bias vs update-rule) on the ${SSTEP} NLL checkpoint" \
            "$A/sudoku_corrector_diag.jsonl" '"probe": "C"'
    fi
fi

# ---- stage 4: maze 500k + snapshots + decline decomposition ----
if [ "$(left)" -gt 10800 ] && [ ! -s "$A/maze_decline.jsonl" ]; then
    if ! ls -d runs/tauUnet_maze/*/*/checkpoints/500000 >/dev/null 2>&1; then
        nohup bash scripts/snapshot_collector.sh 'runs/tauUnet_maze/*/*/checkpoints' \
            runs/maze_snapshots 60000 60 > /tmp/maze_snapshots.log 2>&1 &
        MSNAP_PID=$!
        WATCHDOG_STALL=600 timeout 9000 bash scripts/train_watchdog.sh \
            tauUnet_maze 500000 \
            --set sampler.sample_freq=1000000 saving.checkpoint_freq=20000 \
            > /tmp/queue_maze_train.log 2>&1
        note "maze 500k watchdog rc=$?"
        reap_trainer tauUnet_maze
        kill "$MSNAP_PID" 2>/dev/null
    fi
    MDIR=$(newest_nonempty_ckpts 'runs/tauUnet_maze/*/*/checkpoints')
    MSTEP=$(ls "$MDIR" 2>/dev/null | grep '^[0-9]*$' | sort -n | tail -1)
    if [ -d runs/maze_snapshots ] && [ -n "$MSTEP" ]; then
        [ -d "runs/maze_snapshots/$MSTEP" ] || cp -r "$MDIR/$MSTEP" "runs/maze_snapshots/$MSTEP"
        cp /tmp/train_tauUnet_maze.log "$A/maze_train.log" 2>/dev/null
        timeout 5400 python scripts/diag_maze_decline.py \
            --snapshots runs/maze_snapshots --n 256 \
            --out "$A/maze_decline.jsonl" > "$A/maze_decline.log" 2>&1
        note "maze decline diag rc=$?"
        commit_evidence \
            "Round-5 evidence: maze long-horizon decline decomposition (eval-loss vs decode, raw vs EMA) to ${MSTEP} under the LBJF/200 preset decode" \
            "$A/maze_decline.jsonl" 'maze_acc'
    fi
fi

# ---- stage 5a: synthetic EBM full schedule + MMD (quick) ----
if [ "$(left)" -gt 2700 ] && [ ! -s "$A/ebm_3k_mmd.log" ]; then
    if ! ls -d runs/synthetic_ebm/*/*/checkpoints/3000 >/dev/null 2>&1; then
        WATCHDOG_STALL=600 timeout 1800 bash scripts/train_watchdog.sh \
            ebm_synthetic 3000 --set sampler.sample_freq=1000000 \
            > /tmp/queue_ebm_train.log 2>&1
        note "ebm 3k watchdog rc=$?"
        reap_trainer ebm_synthetic
    fi
    EDIR=$(newest_nonempty_ckpts 'runs/synthetic_ebm/*/*/checkpoints')
    ESTEP=$(ls "$EDIR" 2>/dev/null | grep '^[0-9]*$' | sort -n | tail -1)
    if [ -n "$ESTEP" ]; then
        cp /tmp/train_ebm_synthetic.log "$A/ebm_3k_train.log" 2>/dev/null
        timeout 2400 python eval.py --preset ebm_synthetic --ckpt "$EDIR" \
            --step "$ESTEP" --metric mmd --rounds 3 --samples 1024 \
            > "$A/ebm_3k_mmd.log" 2>&1
        note "ebm mmd rc=$?"
        commit_evidence "Round-5 evidence: synthetic EBM full 3k schedule + MMD" \
            "$A/ebm_3k_mmd.log" 'mmd'
    fi
fi

# ---- stage 5b: mnist_d3pm image-scale + FID trajectory ----
D3PM_BUDGET=$(( $(left) - 7200 ))   # leave 2h for protein + closeout
if [ "$D3PM_BUDGET" -gt 3600 ] && [ ! -s "$A/d3pm_fid/fid.jsonl" ]; then
    [ "$D3PM_BUDGET" -gt 7200 ] && D3PM_BUDGET=7200
    nohup bash scripts/snapshot_collector.sh 'runs/mnist_d3pm/*/*/checkpoints' \
        runs/d3pm_snapshots 25000 60 > /tmp/d3pm_snapshots.log 2>&1 &
    DSNAP_PID=$!
    WATCHDOG_STALL=600 timeout "$D3PM_BUDGET" bash scripts/train_watchdog.sh \
        mnist_d3pm 600000 \
        --set sampler.sample_freq=1000000 saving.checkpoint_freq=25000 \
        > /tmp/queue_d3pm_train.log 2>&1
    note "mnist_d3pm watchdog rc=$? (time-boxed)"
    reap_trainer mnist_d3pm
    kill "$DSNAP_PID" 2>/dev/null
    DDIR=$(newest_nonempty_ckpts 'runs/mnist_d3pm/*/*/checkpoints')
    DSTEP=$(ls "$DDIR" 2>/dev/null | grep '^[0-9]*$' | sort -n | tail -1)
    if [ -n "$DSTEP" ]; then
        [ -d "runs/d3pm_snapshots/$DSTEP" ] || cp -r "$DDIR/$DSTEP" "runs/d3pm_snapshots/$DSTEP"
        cp /tmp/train_mnist_d3pm.log "$A/d3pm_train.log" 2>/dev/null
        timeout 3600 python scripts/fid_trajectory.py \
            --preset mnist_d3pm --snapshots runs/d3pm_snapshots \
            --features trained --out "$A/d3pm_fid" \
            > "$A/d3pm_fid_trajectory.log" 2>&1
        note "d3pm fid trajectory rc=$?"
        if [ ! -s "$A/d3pm_fid/fid.jsonl" ]; then
            timeout 3600 python scripts/fid_trajectory.py \
                --preset mnist_d3pm --snapshots runs/d3pm_snapshots \
                --features auto --out "$A/d3pm_fid" \
                >> "$A/d3pm_fid_trajectory.log" 2>&1
            note "d3pm fid trajectory (auto fallback) rc=$?"
        fi
        commit_evidence \
            "Round-5 evidence: mnist_d3pm image-scale run to ${DSTEP} + trained-feature FID trajectory" \
            "$A/d3pm_fid/fid.jsonl" 'fid'
    fi
fi

# ---- stage 5c: protein hollow 100k + MMD ----
if [ "$(left)" -gt 4500 ] && [ ! -s "$A/protein_mmd.log" ]; then
    if ! ls -d runs/protein_hollow/*/*/checkpoints/100000 >/dev/null 2>&1; then
        PB=$(( $(left) - 3000 )); [ "$PB" -gt 7200 ] && PB=7200
        WATCHDOG_STALL=600 timeout "$PB" bash scripts/train_watchdog.sh \
            hollow_protein 100000 \
            --set sampler.sample_freq=1000000 saving.checkpoint_freq=10000 \
            > /tmp/queue_protein_train.log 2>&1
        note "protein watchdog rc=$?"
        reap_trainer hollow_protein
    fi
    PDIR=$(newest_nonempty_ckpts 'runs/protein_hollow/*/*/checkpoints')
    PSTEP=$(ls "$PDIR" 2>/dev/null | grep '^[0-9]*$' | sort -n | tail -1)
    if [ -n "$PSTEP" ]; then
        cp /tmp/train_hollow_protein.log "$A/protein_train.log" 2>/dev/null
        timeout 2400 python eval.py --preset hollow_protein --ckpt "$PDIR" \
            --step "$PSTEP" --metric mmd --rounds 3 --samples 512 \
            > "$A/protein_mmd.log" 2>&1
        note "protein mmd rc=$?"
        commit_evidence "Round-5 evidence: protein hollow trained to ${PSTEP} + MMD" \
            "$A/protein_mmd.log" 'mmd'
    fi
fi

# ---- stage 6: bin_mnist_hollow with leftovers ----
BMB=$(( $(left) - 1800 ))
if [ "$BMB" -gt 3600 ]; then
    WATCHDOG_STALL=900 timeout "$BMB" bash scripts/train_watchdog.sh \
        bin_mnist_hollow 500000 \
        --set sampler.sample_freq=1000000 saving.checkpoint_freq=10000 \
        > /tmp/queue_binmnist_train.log 2>&1
    note "bin_mnist watchdog rc=$?"
    reap_trainer bin_mnist_hollow
    BDIR=$(newest_nonempty_ckpts 'runs/bin_mnist_hollow/*/*/checkpoints')
    BSTEP=$(ls "$BDIR" 2>/dev/null | grep '^[0-9]*$' | sort -n | tail -1)
    if [ -n "$BSTEP" ]; then
        cp /tmp/train_bin_mnist_hollow.log "$A/binmnist_train.log" 2>/dev/null
        commit_evidence "Round-5 evidence: bin_mnist hollow trained to ${BSTEP}" \
            "$A/binmnist_train.log" 'iter'
    fi
fi

# ---- stage 7: bf16 scan crash repro (LAST) ----
timeout 1200 python scripts/bf16_scan_repro.py > "$A/bf16_scan_crash.log" 2>&1
note "bf16 scan crash repro rc=$? (nonzero expected)"
timeout 300 python -c "import jax; print('post-repro devices:', jax.devices())" \
    >> "$A/bf16_scan_crash.log" 2>&1
note "post-repro device probe rc=$?"
git add -A "$A" && git commit -q -m \
    "Round-5 evidence: bf16 1000-step scan crash repro rerun (self-contained, version stamps)" || true

note "queue(5) done"
