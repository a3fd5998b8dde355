#!/bin/bash
# Round-5 rev c: closeout queue. Takes over from 5b (killed after its maze
# TRAIN stage started; the watchdog/collector orphans keep training).
# Order fixed vs 5b: the sudoku corrector diag re-runs with the
# create_model fix, the conditional demo figure lands, and mnist_d3pm
# (VERDICT #4) outranks protein (#5) for the last training slot.
set -u
cd /root/repo
echo $$ > "/tmp/queue_gen.$$.pid"
trap 'rm -f "/tmp/queue_gen.$$.pid"' EXIT
echo $$ > /tmp/queue5c.pid

TPU_END=${TPU_END:?set explicitly}
left() { echo $(( TPU_END - $(date +%s) )); }
note() { echo "queue(5c): $* at $(date), left=$(left)s"; }
A=docs/assets/round5

commit_evidence() {
    local msg="$1" f="$2" pat="${3:-}"
    if [ ! -s "$f" ]; then note "NOT committing ($f empty/missing): $msg"; return 1; fi
    if [ -n "$pat" ] && ! grep -q "$pat" "$f"; then
        note "NOT committing ($f lacks /$pat/): $msg"; return 1; fi
    git add -A "$A" && git commit -q -m "$msg" && note "committed: $msg"
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

# ---- stage 0: wait for the maze train to reach 500k (or watchdog death) ----
note "waiting for maze 500k (watchdog orphan from 5b)"
while true; do
    ls -d runs/tauUnet_maze/*/*/checkpoints/500000 >/dev/null 2>&1 && break
    WP=$(cat /tmp/train_tauUnet_maze.pid 2>/dev/null || true)
    if [ -n "$WP" ] && ! kill -0 "$WP" 2>/dev/null; then
        note "maze trainer gone before 500k; proceeding with what exists"
        break
    fi
    [ "$(left)" -lt 2400 ] && { note "time low, stopping maze early"; break; }
    sleep 60
done
P=$(cat /tmp/train_tauUnet_maze.pid 2>/dev/null || true)
[ -n "$P" ] && kill -9 "$P" 2>/dev/null
# reap any straggler watchdog/collector orphans from 5b by pid-file
for f in /tmp/watchdog_gen.*.pid; do
    [ -f "$f" ] || continue
    PP=$(cat "$f"); [ "$PP" != "$$" ] && kill -9 "$PP" 2>/dev/null
done
sleep 3

# ---- stage 1: maze decline decomposition ----
MDIR=$(newest_nonempty_ckpts 'runs/tauUnet_maze/*/*/checkpoints')
MSTEP=$(ls "$MDIR" 2>/dev/null | grep '^[0-9]*$' | sort -n | tail -1)
if [ -d runs/maze_snapshots ] && [ -n "$MSTEP" ] && [ ! -s "$A/maze_decline.jsonl" ]; then
    [ -d "runs/maze_snapshots/$MSTEP" ] || cp -r "$MDIR/$MSTEP" "runs/maze_snapshots/$MSTEP"
    cp /tmp/train_tauUnet_maze.log "$A/maze_train.log" 2>/dev/null
    timeout 4800 python scripts/diag_maze_decline.py \
        --snapshots runs/maze_snapshots --n 256 \
        --out "$A/maze_decline.jsonl" > "$A/maze_decline.log" 2>&1
    note "maze decline diag rc=$?"
    commit_evidence \
        "Round-5 evidence: maze long-horizon decline decomposition (eval-loss vs decode, raw vs EMA) to ${MSTEP} under the LBJF/200 preset decode" \
        "$A/maze_decline.jsonl" 'maze_acc'
fi

# ---- stage 2: sudoku corrector diag (fixed) ----
SDIR=$(newest_nonempty_ckpts 'runs/sudoku/*/*/checkpoints')
SSTEP=$(ls "$SDIR" 2>/dev/null | grep '^[0-9]*$' | sort -n | tail -1)
if [ -n "$SSTEP" ] && [ ! -s "$A/sudoku_corrector_diag.jsonl" ]; then
    cp /tmp/train_sudoku.log "$A/sudoku_train.log" 2>/dev/null
    timeout 4200 python scripts/diag_sudoku_corrector.py --ckpt "$SDIR" \
        --step "$SSTEP" --n 256 --out "$A/sudoku_corrector_diag.jsonl" \
        > "$A/sudoku_corrector_diag.log" 2>&1
    note "sudoku corrector diag rc=$?"
    commit_evidence \
        "Round-5 evidence: sudoku corrector collapse decomposition (churn vs model-bias vs update-rule) on the ${SSTEP} NLL checkpoint" \
        "$A/sudoku_corrector_diag.jsonl" '"probe": "C"'
fi

# ---- stage 3: conditional demo figure ----
if [ ! -s "$A/cond_demo.png" ] && [ -d runs/pianoroll_mitA_snaps/8000 ]; then
    timeout 1800 python scripts/cond_demo_figure.py \
        --ckpt runs/pianoroll_mitA_snaps --step 8000 \
        --out "$A/cond_demo.png" > /tmp/cond_demo_fig.log 2>&1
    note "demo figure rc=$?"
    commit_evidence \
        "Round-5 evidence: conditional demo figure (clamped prefix -> key-following suffixes, lr 5e-5 EMA checkpoint)" \
        "$A/cond_demo.png"
fi

# ---- stage 4: synthetic EBM 3k + MMD ----
if [ "$(left)" -gt 2400 ] && [ ! -s "$A/ebm_3k_mmd.log" ]; then
    if ! ls -d runs/synthetic_ebm/*/*/checkpoints/3000 >/dev/null 2>&1; then
        WATCHDOG_STALL=600 timeout 1500 bash scripts/train_watchdog.sh \
            ebm_synthetic 3000 --set sampler.sample_freq=1000000 \
            > /tmp/queue_ebm_train.log 2>&1
        note "ebm 3k watchdog rc=$?"
        P=$(cat /tmp/train_ebm_synthetic.pid 2>/dev/null || true)
        [ -n "$P" ] && kill -9 "$P" 2>/dev/null; sleep 3
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

# ---- stage 5: mnist_d3pm bounded + FID trajectory (outranks protein) ----
D3PM_BUDGET=$(( $(left) - 2700 ))
if [ "$D3PM_BUDGET" -gt 1500 ] && [ ! -s "$A/d3pm_fid/fid.jsonl" ]; then
    [ "$D3PM_BUDGET" -gt 5400 ] && D3PM_BUDGET=5400
    nohup bash scripts/snapshot_collector.sh 'runs/mnist_d3pm/*/*/checkpoints' \
        runs/d3pm_snapshots 10000 30 > /tmp/d3pm_snapshots.log 2>&1 &
    DSNAP_PID=$!
    WATCHDOG_STALL=600 timeout "$D3PM_BUDGET" bash scripts/train_watchdog.sh \
        mnist_d3pm 600000 \
        --set sampler.sample_freq=1000000 saving.checkpoint_freq=10000 \
        > /tmp/queue_d3pm_train.log 2>&1
    note "mnist_d3pm watchdog rc=$? (time-boxed)"
    P=$(cat /tmp/train_mnist_d3pm.pid 2>/dev/null || true)
    [ -n "$P" ] && kill -9 "$P" 2>/dev/null; sleep 3
    kill "$DSNAP_PID" 2>/dev/null
    DDIR=$(newest_nonempty_ckpts 'runs/mnist_d3pm/*/*/checkpoints')
    DSTEP=$(ls "$DDIR" 2>/dev/null | grep '^[0-9]*$' | sort -n | tail -1)
    if [ -n "$DSTEP" ]; then
        [ -d "runs/d3pm_snapshots/$DSTEP" ] || cp -r "$DDIR/$DSTEP" "runs/d3pm_snapshots/$DSTEP"
        cp /tmp/train_mnist_d3pm.log "$A/d3pm_train.log" 2>/dev/null
        timeout 2400 python scripts/fid_trajectory.py \
            --preset mnist_d3pm --snapshots runs/d3pm_snapshots \
            --features trained --samples 512 --batch 256 \
            --out "$A/d3pm_fid" > "$A/d3pm_fid_trajectory.log" 2>&1
        note "d3pm fid trajectory rc=$?"
        if [ ! -s "$A/d3pm_fid/fid.jsonl" ]; then
            timeout 2400 python scripts/fid_trajectory.py \
                --preset mnist_d3pm --snapshots runs/d3pm_snapshots \
                --features auto --samples 512 --batch 256 \
                --out "$A/d3pm_fid" >> "$A/d3pm_fid_trajectory.log" 2>&1
            note "d3pm fid trajectory (auto fallback) rc=$?"
        fi
        commit_evidence \
            "Round-5 evidence: mnist_d3pm image-scale run to ${DSTEP} + trained-feature FID trajectory" \
            "$A/d3pm_fid/fid.jsonl" 'fid'
    fi
fi

# ---- stage 6: protein hollow bounded + MMD (leftovers) ----
PB=$(( $(left) - 1800 ))
if [ "$PB" -gt 1200 ] && [ ! -s "$A/protein_mmd.log" ]; then
    WATCHDOG_STALL=600 timeout "$PB" bash scripts/train_watchdog.sh \
        hollow_protein 100000 \
        --set sampler.sample_freq=1000000 saving.checkpoint_freq=5000 \
        > /tmp/queue_protein_train.log 2>&1
    note "protein watchdog rc=$?"
    P=$(cat /tmp/train_hollow_protein.pid 2>/dev/null || true)
    [ -n "$P" ] && kill -9 "$P" 2>/dev/null; sleep 3
    PDIR=$(newest_nonempty_ckpts 'runs/protein_hollow/*/*/checkpoints')
    PSTEP=$(ls "$PDIR" 2>/dev/null | grep '^[0-9]*$' | sort -n | tail -1)
    if [ -n "$PSTEP" ]; then
        cp /tmp/train_hollow_protein.log "$A/protein_train.log" 2>/dev/null
        timeout 1500 python eval.py --preset hollow_protein --ckpt "$PDIR" \
            --step "$PSTEP" --metric mmd --rounds 3 --samples 512 \
            > "$A/protein_mmd.log" 2>&1
        note "protein mmd rc=$?"
        commit_evidence "Round-5 evidence: protein hollow trained to ${PSTEP} + MMD" \
            "$A/protein_mmd.log" 'mmd'
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

note "queue(5c) done"
