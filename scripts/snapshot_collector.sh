#!/bin/bash
# Archive rolling orbax checkpoints into a snapshot directory for later
# trajectory evals (scripts/fid_trajectory.py --snapshots <dst>).
#
# The train loop keeps max_to_keep=3 rolling checkpoints (utils/bookkeeping.py:67);
# long-run quality trajectories need more history than that. This poller copies
# the newest *finalized* checkpoint step whenever it is >= INTERVAL steps past
# the last archived one. Orbax finalizes a step by renaming its tmp dir, so any
# plain numeric step dir is safe to copy.
#
# SRC may be a glob (quote it!): watchdog-relaunched runs under auto-resume
# create a NEW dated run dir per relaunch, so a fixed checkpoints dir goes
# stale mid-run. Passing e.g. 'runs/mnist_ll/*/*/checkpoints' scans every
# run dir and archives the globally newest finalized step.
#
# Usage: snapshot_collector.sh <checkpoints_dir_or_glob> <snapshot_dst> [interval_steps] [poll_s]
set -u
SRC="$1"; DST="$2"; INTERVAL="${3:-60000}"; POLL="${4:-300}"
mkdir -p "$DST"
last=-1
for d in "$DST"/*; do
    b=$(basename "$d" 2>/dev/null)
    [[ "$b" =~ ^[0-9]+$ ]] && (( b > last )) && last=$b
done
echo "snapshot_collector: src=$SRC dst=$DST interval=$INTERVAL last=$last"
while true; do
    newest=-1; newest_dir=""
    for d in $SRC/*; do        # unquoted: SRC may be a glob over run dirs
        b=$(basename "$d" 2>/dev/null)
        [[ "$b" =~ ^[0-9]+$ ]] && (( b > newest )) && { newest=$b; newest_dir="$d"; }
    done
    if (( newest >= 0 )) && { (( last < 0 )) || (( newest >= last + INTERVAL )); }; then
        cp -r "$newest_dir" "$DST/$newest.tmp" && mv "$DST/$newest.tmp" "$DST/$newest"
        last=$newest
        echo "snapshot_collector: archived step $newest from $newest_dir"
    fi
    sleep "$POLL"
done
