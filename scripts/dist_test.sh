#!/bin/sh
# Distributed offline evaluation — reference scripts/dist_test.sh
# equivalent (there: torch.distributed.launch over N GPUs with per-rank
# image sharding; here: one SPMD process, eval batches sharded over an
# N-device mesh).
# usage: sh scripts/dist_test.sh <n_devices> <config.yml> [--ckpt path]
#        sh scripts/dist_test.sh <config.yml> [--ckpt path]   # 1 device
case "$1" in
  ''|*[!0-9]*) N=0 ;;
  *) N=$1; shift ;;
esac
CFG=$1; shift
if [ "$N" -gt 1 ]; then
  python tools/test.py -opt "$CFG" --mesh "$N" "$@"
else
  python tools/test.py -opt "$CFG" "$@"
fi
