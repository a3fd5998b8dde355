#!/bin/bash
# Kill orchestrated TPU jobs when the driving session disappears.
#
# Long runs on this box are driven by an interactive session that can be
# torn down at any moment (round end, harness restart). A trainer that
# outlives its driver contends with whatever runs next on the single TPU
# chip (e.g. the end-of-round bench), and nobody is left to kill it. This
# deadman watches a heartbeat file the driver touches while alive; once the
# heartbeat goes stale it stops every job listed in the given pid-files —
# first their direct children (queue shells own foreground trainers), then
# the processes themselves. No pattern kills (kill-by-name can match the
# session's own command line); pids come only from files and /proc ppids.
#
# Usage: session_deadman.sh <heartbeat-file> <stale-seconds> <pidfile>...
# State: log to stdout; exits after firing once (or if heartbeat vanishes).
set -u
HB="$1"; STALE="$2"; shift 2
PIDFILES=("$@")

descendants() {  # print the full /proc subtree of $1, deepest first
    local c
    for c in $(ps -o pid= --ppid "$1" 2>/dev/null); do
        descendants "$c"
        echo "$c"
    done
}

while true; do
    AGE=$(( $(date +%s) - $(stat -c %Y "$HB" 2>/dev/null || echo 0) ))
    if [ "$AGE" -gt "$STALE" ]; then
        echo "deadman: heartbeat ${HB} stale ${AGE}s at $(date) — stopping jobs"
        for f in "${PIDFILES[@]}"; do
            P=$(cat "$f" 2>/dev/null) || continue
            [ -n "$P" ] || continue
            # queue shells run trainers under timeout/watchdog wrappers;
            # killing one level would orphan the leaf python — walk the
            # whole subtree, leaves first
            for C in $(descendants "$P"); do
                kill -9 "$C" 2>/dev/null
            done
            kill -9 "$P" 2>/dev/null && echo "deadman: killed $P ($f)"
        done
        exit 0
    fi
    sleep 120
done
