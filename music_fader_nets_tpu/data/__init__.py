from music_fader_nets_tpu.data.datasets import (  # noqa: F401
    YamahaDataset,
    VGMIDIDataset,
)
from music_fader_nets_tpu.data.corpus import (  # noqa: F401
    get_classic_piano,
    get_vgmidi,
)
from music_fader_nets_tpu.data.loader import batch_iterator  # noqa: F401
