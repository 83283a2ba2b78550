#!/bin/bash
# Babysit a long training run on the restart-prone sandbox:
#   - prune old state_<step> dirs (orbax save keeps every one; 60 x ~GB
#     checkpoints would fill the disk) keeping the newest $KEEP
#   - every $MIRROR_EVERY seconds, mirror the newest state + params into a
#     git commit via mirror_durable.sh (VM restarts wipe everything but git)
# Exits when the watched pid dies, after one final prune+mirror.
#
# Usage: scripts/train_babysitter.sh <pidfile> <ckpt_dir> <mirror_name>
set -u
cd "$(dirname "$0")/.."
PIDFILE=$1
CKPT=$2
NAME=$3
KEEP=${KEEP:-2}
MIRROR_EVERY=${MIRROR_EVERY:-2700}
last_mirror=0

prune() {
  [ -d "$CKPT" ] || return 0
  ls -d "$CKPT"/state_* 2>/dev/null | sort -t_ -k2 -n | head -n -"$KEEP" \
    | while read -r d; do rm -rf "$d"; echo "[babysitter] pruned $d"; done
}

mirror() {
  [ -d "$CKPT" ] || return 0
  local latest
  latest=$(ls -d "$CKPT"/state_* 2>/dev/null | sort -t_ -k2 -n | tail -1)
  [ -n "$latest" ] || return 0
  local stage=/tmp/mirror_stage_$NAME
  rm -rf "$stage"; mkdir -p "$stage"
  nice cp -r "$latest" "$stage/"
  for f in params tokenizer.json config.yaml; do
    [ -e "$CKPT/$f" ] && nice cp -r "$CKPT/$f" "$stage/" 2>/dev/null
  done
  bash scripts/mirror_durable.sh "$stage" "$NAME"
}

while kill -0 "$(cat "$PIDFILE" 2>/dev/null)" 2>/dev/null; do
  prune
  now=$(date +%s)
  # stall detector: the trainer touches .heartbeat each log interval
  # (train_loop.fit); a stale mtime with a live pid = wedged device call
  # (seen live: a dropped tunnel connection stalled steps for >1 h while
  # the process stayed alive)
  hb="$CKPT/.heartbeat"
  if [ -f "$hb" ]; then
    age=$(( now - $(stat -c %Y "$hb") ))
    [ "$age" -gt 900 ] && echo "[babysitter] WARNING: no training step for ${age}s (pid alive — likely a wedged/reconnecting tunnel, do NOT assume dead)"
  fi
  if [ $((now - last_mirror)) -ge "$MIRROR_EVERY" ]; then
    mirror && last_mirror=$now
  fi
  sleep 120
done
prune
mirror
echo "[babysitter] trainer exited; final mirror done"
