#!/bin/bash
# Wait until FILE contains PATTERN, then exec a command.
#   wait_then_run.sh FILE PATTERN -- cmd...
# Used to chain measurement queues without editing a running script
# (bash reads scripts by byte offset; editing mid-run corrupts control
# flow).  Polls every 60 s; no timeout — bound the caller instead.
FILE=$1; PATTERN=$2; shift 2
[ "$1" = "--" ] && shift
while ! grep -q "$PATTERN" "$FILE" 2>/dev/null; do sleep 60; done
exec "$@"
