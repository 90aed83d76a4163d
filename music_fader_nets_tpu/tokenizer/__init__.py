from music_fader_nets_tpu.tokenizer.midi_io import (  # noqa: F401
    MidiNote, MidiData, read_midi, write_midi,
)
from music_fader_nets_tpu.tokenizer.event_codec import (  # noqa: F401
    encode_pianoroll, decode_events, pitch_lists_to_rhythm,
)
from music_fader_nets_tpu.tokenizer.performance_codec import (  # noqa: F401
    performance_encode, performance_decode, EVENT_DIMS,
)
from music_fader_nets_tpu.tokenizer.attributes import (  # noqa: F401
    get_music_attributes,
)
from music_fader_nets_tpu.tokenizer.key_estimate import (  # noqa: F401
    harmony_vector_from_chroma, harmony_vector_from_notes,
)
