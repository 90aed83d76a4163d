from music_fader_nets_tpu.transfer.arousal import (  # noqa: F401
    compute_shift_vectors,
    arousal_transfer,
)
from music_fader_nets_tpu.transfer.audio import (  # noqa: F401
    notes_to_wav,
    render_notes,
    write_wav,
)
