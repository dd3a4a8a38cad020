#!/bin/bash
# Serialized, disciplined TPU-chip launcher (VERDICT r4 item 2).
#
# Every chip-touching process in this repo must go through this wrapper.
# It encodes the axon-tunnel operational rules that were learned the hard
# way (CLAUDE.md "Environment facts"):
#   1. Only ONE process may use the chip at a time -> flock on /tmp/chip.lock.
#   2. A new process launched too soon after the previous one releases the
#      chip gets a poisoned tunnel session: setup works, but the first large
#      program's D2H fails with INVALID_ARGUMENT (round-4 sessions 1+2,
#      reproduced; both committed synthkitti20_r4 crashes match this
#      signature).  -> probe the chip, then leave a RELEASE_GAP (default
#      90 s) before launching.
#   3. A poisoned session is a process-level transient: the same program in
#      a fresh process (after a cooldown) runs clean.  -> on a nonzero exit
#      whose log shows INVALID_ARGUMENT, cool down and retry once.
#
# Usage: misc/chip_run.sh [-r RETRIES] [-g GAP_S] LOGFILE -- cmd args...
# The command's stdout+stderr are appended to LOGFILE, followed by "rc=N".
# Exit status is the command's final rc.

set -u
RETRIES=1
GAP=90
COOLDOWN=180
while getopts "r:g:" opt; do
  case $opt in
    r) RETRIES=$OPTARG ;;
    g) GAP=$OPTARG ;;
    *) echo "usage: $0 [-r retries] [-g gap_s] LOGFILE -- cmd..." >&2; exit 2 ;;
  esac
done
shift $((OPTIND - 1))
LOG=$1
shift
[ "${1:-}" = "--" ] && shift

cd /root/repo
exec 9>/tmp/chip.lock
flock 9 || { echo "chip lock failed" >&2; exit 3; }

probe() {
  # NOTE: jax.devices() initialises the real backend; when the tunnel is
  # wedged it hangs, hence the hard timeout.  A rc!=0 probe means the chip
  # is down or held -- wait and re-probe.
  timeout 240 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

attempt=0
while :; do
  attempt=$((attempt + 1))
  until probe; do
    echo "$(date -u +%FT%TZ) chip probe failed; re-probing in 240 s" | tee -a "$LOG"
    sleep 240
  done
  echo "$(date -u +%FT%TZ) chip probe ok; waiting ${GAP}s tunnel-release gap" >> "$LOG"
  sleep "$GAP"
  echo "$(date -u +%FT%TZ) launching (attempt $attempt): $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  rc=$?
  echo "rc=$rc" >> "$LOG"
  if [ "$rc" -ne 0 ] && [ "$attempt" -le "$RETRIES" ] \
     && tail -40 "$LOG" | grep -q "INVALID_ARGUMENT"; then
    echo "$(date -u +%FT%TZ) INVALID_ARGUMENT transient; cooling down ${COOLDOWN}s and retrying" >> "$LOG"
    sleep "$COOLDOWN"
    continue
  fi
  exit "$rc"
done
