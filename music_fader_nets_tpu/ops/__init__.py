from music_fader_nets_tpu.ops.gru import (  # noqa: F401
    GRU_GATES,
    gru_cell,
    gru_init,
    gru_scan,
    bigru_final_state,
    linear,
    linear_init,
    linear_apply,
)
from music_fader_nets_tpu.ops.sampling import (  # noqa: F401
    argmax_one_hot,
    reparameterize,
    grad_reverse,
)
