#!/bin/bash
# Round-3 TPU chain (rev g): flagship 600k -> fid_stats -> pytest(fast) ->
# pianoroll_cond 12k + cond_mmd -> sudoku 50k -> sudoku sweep -> pytest(slow)
# -> CIFAR10 (runs to round end; heartbeat deadman kills it if session dies).
#
# Provenance copy of the queue actually run for the round-3 evidence (the
# live instance executes from /tmp). Stages are strictly serial: one heavy
# TPU client at a time (see .claude/skills/verify/SKILL.md on wedges), and
# pytest never runs beside a trainer on this 1-vCPU host. Companion daemons:
# scripts/train_watchdog.sh (flagship auto-resume), snapshot_collector.sh
# (checkpoint archive), evidence_harvester.sh (log/jsonl mirroring into
# docs/assets/round3/), session_deadman.sh (kill-all on session death).
set -u
cd /root/repo
echo "queue: waiting for flagship 600000 checkpoint"
while true; do
    RUN=$(ls -d runs/mnist_ll/*/*/checkpoints/600000 2>/dev/null | head -1)
    [ -n "$RUN" ] && break
    sleep 60
done
RUN=$(dirname "$RUN")
echo "queue: flagship done, ckpts at $RUN ($(date))"
P=$(cat /tmp/flagship.pid 2>/dev/null)
[ -n "$P" ] && for i in $(seq 1 30); do kill -0 "$P" 2>/dev/null || break; sleep 10; done
kill "$(cat /tmp/snapcol.pid)" 2>/dev/null
cp -r "$RUN/600000" runs/mnist_ll_snapshots/600000.tmp 2>/dev/null && \
    mv runs/mnist_ll_snapshots/600000.tmp runs/mnist_ll_snapshots/600000

echo "queue: starting fid_stats at $(date)"
timeout 4800 python scripts/fid_stats.py --preset tauUnet_mnist_ll \
    --snapshots "$RUN" --step 600000 --samples 4096 --seeds 3 \
    --samplers MidPointTauL,TauL --features trained \
    --out runs/mnist_ll_fid_stats > /tmp/fid_stats.log 2>&1
echo "queue: fid_stats rc=$? at $(date)"

echo "queue: starting pytest fast at $(date)"
timeout 2400 python -m pytest tests/ -q -m "not slow" > /tmp/pytest_fast.log 2>&1
echo "queue: pytest fast rc=$? at $(date)"
tail -3 /tmp/pytest_fast.log

echo "queue: starting pianoroll_cond 12k at $(date)"
timeout 1800 python train.py --preset pianoroll_cond --iters 12000 \
    --set saving.checkpoint_freq=6000 sampler.sample_freq=6000 \
    > /tmp/cond.log 2>&1
echo "queue: cond train rc=$? at $(date)"
PDIR=$(ls -dt runs/pianoroll_cond/*/*/checkpoints 2>/dev/null | head -1)
timeout 1500 python eval.py --preset pianoroll_cond --ckpt "$PDIR" \
    --metric cond_mmd --samples 1024 --batch 512 \
    > /tmp/cond_eval.log 2>&1
echo "queue: cond eval rc=$? at $(date)"

echo "queue: starting sudoku 50k at $(date)"
timeout 3600 python train.py --preset sudoku --iters 50000 --auto-resume \
    --set saving.checkpoint_freq=10000 > /tmp/sudoku.log 2>&1
echo "queue: sudoku train rc=$? at $(date)"
SDIR=$(ls -dt runs/sudoku/*/*/checkpoints 2>/dev/null | head -1)
echo "queue: sudoku ckpts at $SDIR"

echo "queue: starting sudoku sweep at $(date)"
timeout 3000 python scripts/maze_sweep.py --preset sudoku --ckpt "$SDIR" \
    --samples 512 --samplers TauL,LBJF --num-steps 200,1000 \
    --correctors off --params ema --tag fresh50k \
    --out docs/assets/round3/sudoku_sweep.jsonl > /tmp/sudoku_sweep.log 2>&1
timeout 1200 python scripts/maze_sweep.py --preset sudoku --ckpt "$SDIR" \
    --samples 512 --samplers TauL --num-steps 1000 \
    --correctors on --params ema --tag fresh50k \
    --out docs/assets/round3/sudoku_sweep.jsonl >> /tmp/sudoku_sweep.log 2>&1
echo "queue: sudoku sweep rc=$? at $(date)"

echo "queue: starting pytest slow at $(date)"
timeout 1800 python -m pytest tests/ -q -m slow > /tmp/pytest_slow.log 2>&1
echo "queue: pytest slow rc=$? at $(date)"
tail -3 /tmp/pytest_slow.log

echo "queue: starting cifar10 at $(date)"
nohup python train.py --preset tauUnet_cifar10 --iters 50000 --auto-resume \
    --set sampler.sample_freq=5000 saving.checkpoint_freq=5000 \
    > /tmp/cifar.log 2>&1 &
echo $! > /tmp/cifar.pid
echo "queue: done dispatching at $(date)"
