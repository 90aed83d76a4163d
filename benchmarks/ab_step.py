"""Quick A/B of the trainer steady-state step vs the FORWARD _pick_l_block
policy (plus a 'noembed' arm that disables the embedded-token encoder
kernel).

NB scope: since the time-blocked backward refactor, the backward kernels
size their accumulators via _pick_bwd_blocks/_pick_t_block, NOT
_pick_l_block — the 'old' arm below changes only the forward layout. The
historical "bwd pretends 2B" emulation it carries is therefore inert; the
printed old-vs-new delta isolates the forward l-block choice."""
import argparse

import jax

from music_fader_nets_tpu.config import ModelConfig
from music_fader_nets_tpu.data.datasets import YamahaDataset
from music_fader_nets_tpu.data.synthetic import synth_corpus
from music_fader_nets_tpu.models import init_reg_gmvae
from music_fader_nets_tpu.ops import pallas_gru
from music_fader_nets_tpu.train import Trainer
from music_fader_nets_tpu.train.objectives import gmm_loss


def measure(dtype="float32", use_pallas=True):
    cfg = ModelConfig(num_clusters=2, dtype=dtype, use_pallas_gru=use_pallas)
    yam = YamahaDataset(*synth_corpus(512, cfg.seq_len, cfg.attr_len),
                        mode="train")
    tr = Trainer(cfg, init_reg_gmvae, {"default": gmm_loss})
    t = tr.steady_state_step_time(yam.arrays(), iters=20)
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--policies", default="new,old")
    args = ap.parse_args()
    orig = pallas_gru._pick_l_block
    try:
        _run(args, orig)
    finally:
        pallas_gru._pick_l_block = orig


def _run(args, orig):
    for pol in args.policies.split(","):
        if pol == "noembed":
            # disable the embedded-token encoder kernel; generic pre-kernel
            from music_fader_nets_tpu.ops import gru as gru_mod
            saved = gru_mod._embed_kernel_dispatch
            gru_mod._embed_kernel_dispatch = lambda B: (None, None)
            try:
                t = measure(args.dtype)
            finally:
                gru_mod._embed_kernel_dispatch = saved
            print(f"policy={pol} dtype={args.dtype}: step={t * 1e3:.3f} ms "
                  f"({128 / t:.0f} seq/s)", flush=True)
            continue
        if pol == "old":
            # old = 13MB budget (forward only — see module docstring)
            def old13(L, B, H, G, itemsize):
                budget = 13 * 1024 * 1024
                for lb in range(L, 0, -1):
                    if L % lb:
                        continue
                    need = (lb * H * G * itemsize + 2 * lb * B * G * itemsize
                            + 2 * lb * B * H * itemsize + 2 * lb * B * H * 4)
                    if need <= budget:
                        return lb
                return 1
            pallas_gru._pick_l_block = old13
        else:
            pallas_gru._pick_l_block = orig
        t = measure(args.dtype)
        print(f"policy={pol:4s} dtype={args.dtype}: step={t * 1e3:.3f} ms "
              f"({128 / t:.0f} seq/s)", flush=True)


if __name__ == "__main__":
    main()
