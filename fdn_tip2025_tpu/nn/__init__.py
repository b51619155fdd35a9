"""Neural building blocks (functional: init_*(key, ...) -> params, apply(params, x)).

Param trees are nested dicts whose keys mirror the reference's torch module
names (Sequential children as "0", "1", ...) so that .pth state dicts map
1:1 through fdn_tip2025_tpu.checkpoint.torch_import. The computation itself
is NHWC / TPU-first; parity targets are cited per block.
"""

from fdn_tip2025_tpu.nn.basic import (
    basic_conv, init_basic_conv,
    aff, init_aff,
    fam, init_fam,
    spa_block, init_spa_block,
    fre_block, init_fre_block,
    process_block, init_process_block,
    fourier_fuse, init_fourier_fuse,
)
from fdn_tip2025_tpu.nn.attention import fdsa, init_fdsa
from fdn_tip2025_tpu.nn.ffn import fdffn, init_fdffn, fcaffn, init_fcaffn
from fdn_tip2025_tpu.nn.transformer import (
    transformer_block, init_transformer_block,
    fuse, init_fuse,
    overlap_patch_embed, init_overlap_patch_embed,
    downsample, init_downsample,
    upsample, init_upsample,
)
from fdn_tip2025_tpu.nn.se import se_block, init_se_block
