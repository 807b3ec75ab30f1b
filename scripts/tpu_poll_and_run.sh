#!/bin/bash
# Poll the TPU tunnel until it answers, then run a command.
#
# The axon tunnel goes down for hours at a time (round 2: ~21:40 Aug 17
# onward, backend init UNAVAILABLE or hangs).  A probe is a tiny matmul
# with a HOST VALUE FETCH (block_until_ready does not fence on axon);
# each probe gets `timeout 300` so a hung backend init can't wedge the
# loop.  Background this and do CPU work meanwhile; never run another
# jax process alongside the command once it starts.
#
# Usage: bash scripts/tpu_poll_and_run.sh [attempts] [sleep_s] -- cmd...
# attempts/sleep_s are genuinely optional: `tpu_poll_and_run.sh -- cmd`
# uses the defaults (the round-2 version mis-parsed '--' as ATTEMPTS and
# exited 0 without running anything — advisor finding).
ATTEMPTS=40
SLEEP=480
if [ "$1" != "--" ] && [ -n "$1" ]; then ATTEMPTS=$1; shift; fi
if [ "$1" != "--" ] && [ -n "$1" ]; then SLEEP=$1; shift; fi
[ "$1" = "--" ] && shift

for i in $(seq 1 "$ATTEMPTS"); do
  if timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print('TPU_OK', float((x @ x).sum()))
" > /tmp/tpu_probe.log 2>&1; then
    echo "probe ok at attempt $i $(date)" >> /tmp/tpu_probe.log
    exec "$@"
  fi
  sleep "$SLEEP"
done
echo "TPU never came back after $ATTEMPTS attempts" >> /tmp/tpu_probe.log
exit 1
