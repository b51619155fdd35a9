#!/bin/sh
# LPNet training launcher — reference train_lpnet.sh equivalent.
python tools/train.py -opt configs/lpnet_train.yml "$@"
