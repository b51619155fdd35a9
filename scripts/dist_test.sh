#!/bin/sh
# Offline evaluation — reference scripts/dist_test.sh equivalent.
# usage: sh scripts/dist_test.sh <config.yml> [--ckpt path]
CFG=$1; shift
python tools/test.py -opt "$CFG" "$@"
