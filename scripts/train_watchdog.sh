#!/bin/bash
# Keep a long training run alive across TPU-client wedges.
#
# The axon tunnel on this host class occasionally wedges a healthy trainer
# (main thread futex-wait, ~1% CPU, log mtime frozen — see
# .claude/skills/verify/SKILL.md). Resume is deterministic (bitwise-equal
# restart is test-pinned), so the safe response is kill -9 + --auto-resume.
# This watchdog automates that: it relaunches the trainer whenever the log
# stops advancing for STALL seconds or the process dies, and exits once the
# target checkpoint step exists.
#
# Usage: train_watchdog.sh <preset> <target_step> [extra --set args...]
# State: pid in /tmp/watchdog_<preset>.pid, log /tmp/watchdog_<preset>.log,
#        trainer log /tmp/train_<preset>.log.
set -u
PRESET="$1"; TARGET="$2"; shift 2
EXTRA=("$@")
# Unique per-generation pid-file: relaunches overwrite /tmp/watchdog_<preset>.pid,
# which made earlier generations invisible to the deadman/reap sweeps (observed
# 2026-08-18: three stale queue shells fired duplicate jobs at once). reap.py
# globs /tmp/*.pid, so this keeps every live generation reapable.
echo $$ > "/tmp/watchdog_gen.$$.pid"
trap 'rm -f "/tmp/watchdog_gen.$$.pid"' EXIT
STALL="${WATCHDOG_STALL:-420}"        # wedge threshold (s); > one grid-sample pass
COMPILE_GRACE="${WATCHDOG_GRACE:-300}" # post-launch compile window (s)
cd "$(dirname "$0")/.."
TLOG="/tmp/train_${PRESET}.log"
TPID="/tmp/train_${PRESET}.pid"

launch() {
    nohup python train.py --preset "$PRESET" --auto-resume "${EXTRA[@]}" \
        > "$TLOG" 2>&1 &
    echo $! > "$TPID"
    echo "watchdog: launched trainer pid $(cat "$TPID") at $(date)"
    sleep "$COMPILE_GRACE"
}

# WATCHDOG_SAVE_ROOT overrides the preset's save_location — required when the
# trainer itself is launched with a `--set save_location=...` override, or the
# target-checkpoint test below watches the wrong directory forever.
SAVE_ROOT="${WATCHDOG_SAVE_ROOT:-}"
if [ -z "$SAVE_ROOT" ]; then
    SAVE_ROOT=$(python - "$PRESET" <<'EOF'
import sys
import jax; jax.config.update("jax_platforms", "cpu")
from ctdd_tpu.config.presets import get_preset
print(get_preset(sys.argv[1]).save_location)
EOF
) || { echo "watchdog: preset resolve failed"; exit 1; }
fi
echo "watchdog: preset=$PRESET save_root=$SAVE_ROOT target=$TARGET"

while true; do
    if ls -d "$SAVE_ROOT"/*/*/checkpoints/"$TARGET" >/dev/null 2>&1; then
        echo "watchdog: checkpoint $TARGET present, exiting at $(date)"
        exit 0
    fi
    P=$(cat "$TPID" 2>/dev/null || true)
    if [ -z "$P" ] || ! kill -0 "$P" 2>/dev/null; then
        launch; continue
    fi
    AGE=$(( $(date +%s) - $(stat -c %Y "$TLOG") ))
    if [ "$AGE" -gt "$STALL" ]; then
        echo "watchdog: stall ${AGE}s — killing $P at $(date)"
        kill -9 "$P" 2>/dev/null
        sleep 5
        continue
    fi
    sleep 60
done
