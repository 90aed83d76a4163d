"""Production serving: micro-batched, fixed-shape, kernel-served inference
over a trained checkpoint (the TPU-native form of the reference's
`arousal_transfer.ipynb` inference story)."""
from music_fader_nets_tpu.serve.server import TransferServer

__all__ = ["TransferServer"]
