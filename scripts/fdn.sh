#!/bin/sh
# FDN training launcher — reference fdn.sh equivalent (the SPMD runtime
# replaces torch.distributed.launch; devices come from the jax mesh).
python tools/train.py -opt configs/fdn_lolblur.yml "$@"
