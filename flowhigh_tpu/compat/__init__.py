from .torch_ckpt import (
    load_flowhigh_checkpoint,
    map_model_state_dict,
    map_mpd_state_dict,
    map_mrd_state_dict,
    map_vocoder_state_dict,
    mpd_params_to_torch_state,
    mrd_params_to_torch_state,
    params_to_torch_state,
    vocoder_params_to_torch_state,
    fold_weight_norm,
)

__all__ = [
    "load_flowhigh_checkpoint", "map_model_state_dict",
    "map_mpd_state_dict", "map_mrd_state_dict",
    "map_vocoder_state_dict", "mpd_params_to_torch_state",
    "mrd_params_to_torch_state", "params_to_torch_state",
    "vocoder_params_to_torch_state", "fold_weight_norm",
]
