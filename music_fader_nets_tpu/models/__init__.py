from music_fader_nets_tpu.models.vae import (  # noqa: F401
    init_reg_vae, reg_vae_forward, reg_vae_encode, reg_vae_global_decode,
    reg_vae_decode_tokens,
    init_single_vae, single_vae_forward, single_vae_encode, single_vae_global_decode,
    init_cvae, cvae_forward, cvae_encode, cvae_global_decode,
    init_fader, fader_forward, fader_encode, fader_global_decode,
)
from music_fader_nets_tpu.models.gmvae import (  # noqa: F401
    init_reg_gmvae, reg_gmvae_forward, reg_gmvae_encode, reg_gmvae_global_decode,
    reg_gmvae_decode_tokens,
    reg_gmvae_sample_tokens,
    init_single_gmvae, single_gmvae_forward,
    approx_qy_x,
)
