from music_fader_nets_tpu.utils.checkpoint import (  # noqa: F401
    save_checkpoint,
    restore_checkpoint,
    convert_torch_state_dict,
    params_to_torch_state_dict,
)
