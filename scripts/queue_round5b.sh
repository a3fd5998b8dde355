#!/bin/bash
# Round-5 rev b: the post-breakthrough queue. The lr5e-5 mitigation run
# CURED the pianoroll marginal collapse (CE 0.62 vs 3.79 floor, decode
# scale-consistency 0.90+ vs 0.60 chance) — so mitigation B (dropout) is
# dropped as moot, and the saved TPU time goes to the full-protocol demo
# eval + the remaining VERDICT directives. Stages idempotent; commits gated.
set -u
cd /root/repo
echo $$ > "/tmp/queue_gen.$$.pid"
trap 'rm -f "/tmp/queue_gen.$$.pid"' EXIT
echo $$ > /tmp/queue5b.pid

TPU_END=${TPU_END:-$(( $(date +%s) + 18600 ))}
left() { echo $(( TPU_END - $(date +%s) )); }
note() { echo "queue(5b): $* at $(date), left=$(left)s"; }
A=docs/assets/round5

commit_evidence() {
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

# ---- stage 0: wait for the orphaned lr5e5 trajectory probe, commit it ----
while [ -n "$(cat /tmp/lr5e5_probe.pid 2>/dev/null)" ] && \
      kill -0 "$(cat /tmp/lr5e5_probe.pid)" 2>/dev/null; do sleep 20; done
commit_evidence \
    "Round-5 evidence: lr5e-5 mitigation trajectory — the marginal collapse is CURED (CE 0.62-0.75 vs 3.79 floor, decode sc 0.80-0.92 vs 0.60 chance)" \
    "$A/collapse_traj_lr5e5.jsonl" '"kind": "traj_decode"'

# ---- stage 1: full-protocol conditional demo eval on the cured model ----
if [ ! -s "$A/cond_demo_matrix.jsonl" ] && [ -d runs/pianoroll_mitA_snaps ]; then
    # 8000 = the trajectory's EMA scale-consistency peak (0.922); 14000
    # mid; 20000 final. Full protocol on all three.
    STEPS=8000,14000,20000
    timeout 5400 python scripts/cond_matrix.py --ckpt runs/pianoroll_mitA_snaps \
        --steps "$STEPS" --n 256 --num-steps 1000 \
        --out "$A/cond_demo_matrix.jsonl" > "$A/cond_demo_matrix.log" 2>&1
    note "demo matrix rc=$?"
    commit_evidence \
        "Round-5 DEMO: prefix-conditioned pianoroll generation works (lr5e-5 cure; full 1000-step protocol, n=256, cond_mmd + scale-consistency + free-run)" \
        "$A/cond_demo_matrix.jsonl" '"kind": "cond_decode"'
fi

# ---- stage 2: bf16 B=256 train regression repro ----
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
if [ "$(left)" -gt 9600 ] && [ ! -s "$A/maze_decline.jsonl" ]; then
    if ! ls -d runs/tauUnet_maze/*/*/checkpoints/500000 >/dev/null 2>&1; then
        nohup bash scripts/snapshot_collector.sh 'runs/tauUnet_maze/*/*/checkpoints' \
            runs/maze_snapshots 60000 60 > /tmp/maze_snapshots.log 2>&1 &
        MSNAP_PID=$!
        WATCHDOG_STALL=600 timeout $(( $(left) - 3000 )) bash scripts/train_watchdog.sh \
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

# ---- stage 5: synthetic EBM 3k + MMD ----
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

# ---- stage 6: mnist_d3pm bounded + FID trajectory ----
D3PM_BUDGET=$(( $(left) - 4800 ))
if [ "$D3PM_BUDGET" -gt 2400 ] && [ ! -s "$A/d3pm_fid/fid.jsonl" ]; then
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
        timeout 3000 python scripts/fid_trajectory.py \
            --preset mnist_d3pm --snapshots runs/d3pm_snapshots \
            --features trained --out "$A/d3pm_fid" \
            > "$A/d3pm_fid_trajectory.log" 2>&1
        note "d3pm fid trajectory rc=$?"
        if [ ! -s "$A/d3pm_fid/fid.jsonl" ]; then
            timeout 3000 python scripts/fid_trajectory.py \
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

# ---- stage 7: protein hollow bounded + MMD ----
if [ "$(left)" -gt 3000 ] && [ ! -s "$A/protein_mmd.log" ]; then
    PB=$(( $(left) - 2100 )); [ "$PB" -gt 7200 ] && PB=7200
    WATCHDOG_STALL=600 timeout "$PB" bash scripts/train_watchdog.sh \
        hollow_protein 100000 \
        --set sampler.sample_freq=1000000 saving.checkpoint_freq=10000 \
        > /tmp/queue_protein_train.log 2>&1
    note "protein watchdog rc=$?"
    reap_trainer hollow_protein
    PDIR=$(newest_nonempty_ckpts 'runs/protein_hollow/*/*/checkpoints')
    PSTEP=$(ls "$PDIR" 2>/dev/null | grep '^[0-9]*$' | sort -n | tail -1)
    if [ -n "$PSTEP" ]; then
        cp /tmp/train_hollow_protein.log "$A/protein_train.log" 2>/dev/null
        timeout 1800 python eval.py --preset hollow_protein --ckpt "$PDIR" \
            --step "$PSTEP" --metric mmd --rounds 3 --samples 512 \
            > "$A/protein_mmd.log" 2>&1
        note "protein mmd rc=$?"
        commit_evidence "Round-5 evidence: protein hollow trained to ${PSTEP} + MMD" \
            "$A/protein_mmd.log" 'mmd'
    fi
fi

# ---- stage 8: bf16 scan crash repro (LAST) ----
timeout 1200 python scripts/bf16_scan_repro.py > "$A/bf16_scan_crash.log" 2>&1
note "bf16 scan crash repro rc=$? (nonzero expected)"
timeout 300 python -c "import jax; print('post-repro devices:', jax.devices())" \
    >> "$A/bf16_scan_crash.log" 2>&1
note "post-repro device probe rc=$?"
git add -A "$A" && git commit -q -m \
    "Round-5 evidence: bf16 1000-step scan crash repro rerun (self-contained, version stamps)" || true

note "queue(5b) done"
