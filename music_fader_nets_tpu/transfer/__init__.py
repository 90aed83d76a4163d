from music_fader_nets_tpu.transfer.arousal import (  # noqa: F401
    compute_shift_vectors,
    arousal_transfer,
)
