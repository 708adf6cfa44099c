from .torch_ckpt import (
    load_flowhigh_checkpoint,
    map_model_state_dict,
    map_vocoder_state_dict,
    params_to_torch_state,
    fold_weight_norm,
)

__all__ = [
    "load_flowhigh_checkpoint", "map_model_state_dict",
    "map_vocoder_state_dict", "params_to_torch_state", "fold_weight_norm",
]
