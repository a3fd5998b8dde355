#!/bin/bash
# Evidence harvester: mirror unattended-run outputs from /tmp and the
# gitignored runs/ tree into docs/assets/<tag>/ so the end-of-round commit
# captures them even if the driving session dies mid-queue.
#
# The round queues (scripts/queue_round3.sh) log each stage to /tmp/<stage>.log
# and some stages write jsonl under runs/ (gitignored). Neither survives an
# unattended round end on its own; this poller copies bounded tails of every
# stage log plus the committable jsonl artifacts into the docs tree.
#
# Usage: evidence_harvester.sh [tag]   (default tag: round3)
set -u
TAG="${1:-round3}"
cd "$(dirname "$0")/.."
D="docs/assets/$TAG/queue_logs"
mkdir -p "$D"
while true; do
    [ -f runs/mnist_ll_fid_stats/fid_stats.jsonl ] && \
        cp runs/mnist_ll_fid_stats/fid_stats.jsonl "docs/assets/$TAG/fid_stats.jsonl"
    for f in queue_r3 fid_stats cond cond_eval sudoku sudoku_sweep \
             pytest_fast pytest_slow cifar cifar_eval d3pm d3pm_eval \
             flagship; do
        [ -f "/tmp/$f.log" ] && tail -c 100000 "/tmp/$f.log" > "$D/$f.log"
    done
    sleep 120
done
