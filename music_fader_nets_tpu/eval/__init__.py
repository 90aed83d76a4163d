from music_fader_nets_tpu.eval.controllability import (  # noqa: F401
    clean_output,
    get_classes,
    latent_stats,
    ControllabilityEvaluator,
    SingleVAEControllabilityEvaluator,
    ConditionControllabilityEvaluator,
)
from music_fader_nets_tpu.eval.reconstruction import (  # noqa: F401
    reconstruction_report,
)
