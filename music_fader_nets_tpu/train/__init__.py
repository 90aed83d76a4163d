from music_fader_nets_tpu.train.objectives import (  # noqa: F401
    vanilla_loss, gmm_loss, glsr_loss, cvae_loss, fader_loss, singlevae_loss,
)
from music_fader_nets_tpu.train.trainer import Trainer, TrainState  # noqa: F401
