#!/bin/sh
# MAR pretraining launcher — reference MAR.sh equivalent.
python tools/train.py -opt configs/mar_train.yml "$@"
