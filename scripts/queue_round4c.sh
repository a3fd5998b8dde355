#!/bin/bash
# Round-4 rev c: post-4b follow-up queue. Waits for queue_round4b.sh to print
# its done marker, then spends the remaining session TPU time on:
#   1. maze long-horizon decline diagnostic (VERDICT weak #5) over the
#      stage-3 snapshots collected by 4b.
#   2. synthetic EBM full schedule (3k iters) + MMD eval — promotes the last
#      smoke-only family with a trivial schedule to a full run.
#   3. protein hollow full 100k + MMD eval, if >1h remains.
#   4. bin_mnist_hollow bounded run (whatever is left minus 15 min) with
#      rolling checkpoints — depth, not a VERDICT directive.
# Evidence commits per stage, same discipline as 4b.
set -u
cd /root/repo
echo $$ > /tmp/queue4c.pid
trap 'rm -f /tmp/queue4c.pid' EXIT

SESSION_END=${SESSION_END:?set SESSION_END epoch-secs explicitly}
left() { echo $(( SESSION_END - $(date +%s) )); }
note() { echo "queue(4c): $* at $(date), left=$(left)s"; }
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

# ---- stage 0: wait for 4b to finish ----
while ! grep -q "queue(4b) done" /tmp/queue_round4b.log 2>/dev/null; do
    [ "$(left)" -lt 900 ] && { note "out of time waiting for 4b"; exit 0; }
    sleep 60
done
note "4b done, starting 4c"

# ---- stage 1: maze decline diagnostic ----
MDIR=$(ls -dt runs/tauUnet_maze/*/*/checkpoints 2>/dev/null | head -1)
MSTEP=$(ls "$MDIR" 2>/dev/null | sort -n | tail -1)
if [ -d runs/maze_snapshots ] && [ -n "$MSTEP" ]; then
    [ -d "runs/maze_snapshots/$MSTEP" ] || cp -r "$MDIR/$MSTEP" "runs/maze_snapshots/$MSTEP"
    timeout 5400 python scripts/diag_maze_decline.py \
        --snapshots runs/maze_snapshots --n 256 \
        --out "$A/maze_decline.jsonl" > "$A/maze_decline.log" 2>&1
    note "maze decline diag rc=$?"
    commit_evidence "Round-4 evidence: maze long-horizon decline decomposition (loss vs decode, raw vs EMA)"
fi

# ---- stage 2: synthetic EBM full schedule + MMD ----
if [ "$(left)" -gt 2700 ]; then
    WATCHDOG_STALL=600 timeout 1800 bash scripts/train_watchdog.sh \
        ebm_synthetic 3000 --set sampler.sample_freq=1000000 \
        > /tmp/queue_ebm_train.log 2>&1
    note "ebm 3k watchdog rc=$?"
    reap_trainer ebm_synthetic
    EDIR=$(ls -dt runs/synthetic_ebm/*/*/checkpoints 2>/dev/null | head -1)
    ESTEP=$(ls "$EDIR" 2>/dev/null | sort -n | tail -1)
    if [ -n "$ESTEP" ]; then
        cp /tmp/train_ebm_synthetic.log "$A/ebm_3k_train.log" 2>/dev/null
        timeout 2400 python eval.py --preset ebm_synthetic --ckpt "$EDIR" \
            --step "$ESTEP" --metric mmd --rounds 3 --samples 1024 \
            > "$A/ebm_3k_mmd.log" 2>&1
        note "ebm mmd rc=$?"
        commit_evidence "Round-4 evidence: synthetic EBM full 3k schedule + MMD"
    fi
fi

# ---- stage 3: protein hollow full 100k + MMD ----
if [ "$(left)" -gt 5400 ]; then
    WATCHDOG_STALL=600 timeout $(( $(left) - 2400 )) bash scripts/train_watchdog.sh \
        hollow_protein 100000 \
        --set sampler.sample_freq=1000000 saving.checkpoint_freq=10000 \
        > /tmp/queue_protein_train.log 2>&1
    note "protein 100k watchdog rc=$?"
    reap_trainer hollow_protein
    PDIR=$(ls -dt runs/protein_hollow/*/*/checkpoints 2>/dev/null | head -1)
    PSTEP=$(ls "$PDIR" 2>/dev/null | sort -n | tail -1)
    if [ -n "$PSTEP" ]; then
        cp /tmp/train_hollow_protein.log "$A/protein_train.log" 2>/dev/null
        timeout 2400 python eval.py --preset hollow_protein --ckpt "$PDIR" \
            --step "$PSTEP" --metric mmd --rounds 3 --samples 512 \
            > "$A/protein_${PSTEP}_mmd.log" 2>&1
        note "protein mmd rc=$?"
        commit_evidence "Round-4 evidence: protein hollow trained to ${PSTEP} + MMD"
    fi
fi

# ---- stage 4: bin_mnist_hollow with whatever remains ----
BMB=$(( $(left) - 900 ))
if [ "$BMB" -gt 3600 ]; then
    WATCHDOG_STALL=900 timeout "$BMB" bash scripts/train_watchdog.sh \
        bin_mnist_hollow 500000 \
        --set sampler.sample_freq=1000000 saving.checkpoint_freq=10000 \
        > /tmp/queue_binmnist_train.log 2>&1
    note "bin_mnist watchdog rc=$?"
    reap_trainer bin_mnist_hollow
    BDIR=$(ls -dt runs/bin_mnist_hollow/*/*/checkpoints 2>/dev/null | head -1)
    BSTEP=$(ls "$BDIR" 2>/dev/null | sort -n | tail -1)
    if [ -n "$BSTEP" ]; then
        cp /tmp/train_bin_mnist_hollow.log "$A/binmnist_train.log" 2>/dev/null
        commit_evidence "Round-4 evidence: bin_mnist hollow trained to ${BSTEP}"
    fi
fi
note "queue(4c) done"
