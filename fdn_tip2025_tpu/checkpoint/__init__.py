from fdn_tip2025_tpu.checkpoint.torch_import import (
    load_pth_state_dict,
    convert_state_dict,
    load_model_from_pth,
)
