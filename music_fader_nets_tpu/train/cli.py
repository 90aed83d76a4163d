"""Shared CLI plumbing for the trainer / evaluation entry points.

The reference ships six ~80%-identical trainer scripts and five evaluation
scripts run as `python trainer*.py` / `python test_*_v2.py`
(reference README.md:16-23, 38-40). The repo-root scripts here keep that
public surface; everything they share lives in this module.
"""
from __future__ import annotations

import argparse
import functools
import os
from datetime import datetime
from typing import Callable, Dict

import jax

from music_fader_nets_tpu import models
from music_fader_nets_tpu.config import ModelConfig, load_config
from music_fader_nets_tpu.data import (
    VGMIDIDataset, YamahaDataset, get_classic_piano, get_vgmidi,
)
from music_fader_nets_tpu.parallel import mesh as mesh_lib
from music_fader_nets_tpu.train import objectives
from music_fader_nets_tpu.train.trainer import Trainer, TrainState
from music_fader_nets_tpu.utils.checkpoint import (
    load_pt_checkpoint, restore_checkpoint, save_checkpoint,
)

MODEL_REGISTRY: Dict[str, Dict] = {
    "vanilla": dict(init=models.init_reg_vae,
                    losses={"default": objectives.vanilla_loss},
                    config="configs/model_config_v2.json",
                    name="music_attr_vae_reg_vanilla"),
    "glsr": dict(init=models.init_reg_vae,
                 losses={"default": objectives.glsr_loss},
                 config="configs/model_config_v2.json",
                 name="music_attr_vae_reg_glsr"),
    "gmm": dict(init=models.init_reg_gmvae,
                losses={"default": objectives.gmm_loss,
                        "supervised": functools.partial(
                            objectives.gmm_loss, is_supervised=True)},
                config="configs/gmm_model_config.json",
                name="music_attr_vae_reg_gmm"),
    "cvae": dict(init=models.init_cvae,
                 losses={"default": objectives.cvae_loss},
                 config="configs/model_config_v2.json",
                 name="music_attr_cvae"),
    "fader": dict(init=models.init_fader,
                  losses={"default": objectives.fader_loss},
                  config="configs/model_config_v2.json",
                  name="music_attr_fader"),
    "singlevae": dict(init=models.init_single_vae,
                      losses={"default": objectives.singlevae_loss},
                      config="configs/model_config_v2.json",
                      name="music_attr_vae_singlevae"),
}


def build_argparser(description: str) -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=description)
    ap.add_argument("--config", default=None, help="JSON config path")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--save-dir", default="params")
    ap.add_argument("--data-dir", default=None,
                    help="corpus cache dir (reference data/values_v3 schema)")
    ap.add_argument("--midi-dirs", nargs="*", default=None,
                    help="rebuild corpus from these MIDI directories")
    ap.add_argument("--vgmidi-dir", default=None,
                    help="VGMIDI released-arrays dir (song_tokens.npy etc., "
                         "reference data/filtered_songs_disambiguate); "
                         "ragged object arrays are handled as the reference "
                         "does (EOS re-insert + pad, ptb_v2.py:459-470)")
    ap.add_argument("--synthetic-size", type=int, default=2048,
                    help="synthetic corpus size when no cache/MIDI exists")
    ap.add_argument("--data-type", default="short", choices=["short", "long"],
                    help="corpus variant: short = 4 beats/<=100 tokens, "
                         "long = 16 beats/<=250 tokens (ptb_v2.py:301-303)")
    ap.add_argument("--mesh", default=None,
                    help="mesh shape as DATAxMODEL, e.g. 4x2 (default: 1 chip)")
    ap.add_argument("--dtype", default=None,
                    choices=["float32", "bfloat16"],
                    help="compute dtype: float32 (default, parity) or "
                         "bfloat16 mixed precision (~5%% faster with "
                         "--pallas-gru; f32 master weights either way)")
    ap.add_argument("--pallas-gru", action="store_true",
                    help="fused Pallas GRU training kernels (TPU; ~2.5x "
                         "faster training; composes with pure-dp meshes)")
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                    help="force a JAX platform (NB: the JAX_PLATFORMS env "
                         "var is ignored by the TPU plugin here; this flag "
                         "uses jax.config before backend init)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--kl-warmup", type=int, default=None,
                    help="replace the reference KL anneal with a linear "
                         "0->beta warmup over N steps (the reference "
                         "schedule applies NO KL before step 10000, so "
                         "short runs train with beta=0 throughout)")
    ap.add_argument("--free-bits", type=float, default=None,
                    help="floor each latent dim's KL at this many nats "
                         "before averaging (Kingma et al. free bits): "
                         "protects the attribute-regularized dims from "
                         "KL collapse; 0/unset = reference behavior")
    ap.add_argument("--fixed-quirks", action="store_true",
                    help="disable faithful replication of reference quirks "
                         "(negative-beta window, time-axis sub-decoder "
                         "softmax, GLSR batch-0 bug)")
    ap.add_argument("--from-pt", default=None,
                    help="initialize from a reference .pt state_dict")
    return ap


def enable_compilation_cache():
    """Persistent XLA compile cache: repeated CLI invocations (train, eval,
    parity, transfer) skip recompilation entirely — on the tunneled TPU a
    cold compile of the full train/eval programs costs minutes."""
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def config_from_args(kind: str, args) -> ModelConfig:
    if getattr(args, "platform", None):
        jax.config.update("jax_platforms", args.platform)
    enable_compilation_cache()
    spec = MODEL_REGISTRY[kind]
    path = args.config or (spec["config"]
                           if os.path.exists(spec["config"]) else None)
    overrides = {}
    if args.epochs is not None:
        overrides["n_epochs"] = args.epochs
    if args.batch_size is not None:
        overrides["batch_size"] = args.batch_size
    if getattr(args, "dtype", None):
        overrides["dtype"] = args.dtype
    if getattr(args, "pallas_gru", False):
        overrides["use_pallas_gru"] = True
    if getattr(args, "data_type", "short") == "long":
        overrides.update(seq_len=250, attr_len=64)
    if args.fixed_quirks:
        overrides.update(faithful_negative_beta=False,
                         faithful_subdecoder_softmax_axis=False,
                         faithful_glsr_batch0=False)
    if getattr(args, "kl_warmup", None) is not None:
        overrides["kl_warmup_steps"] = args.kl_warmup
    if getattr(args, "free_bits", None) is not None:
        overrides["free_bits"] = args.free_bits
    cfg = load_config(path, **overrides)
    return cfg


def load_yamaha(args, cfg: ModelConfig):
    *data, source = get_classic_piano(
        data_type=getattr(args, "data_type", "short"),
        cache_dir=args.data_dir,
        midi_dirs=args.midi_dirs,
        n_synthetic=args.synthetic_size,
        return_source=True)
    splits = {mode: YamahaDataset(*data, mode=mode)
              for mode in ("train", "val", "test")}
    for ds in splits.values():
        # corpus provenance ("cache"/"midi"/"synthetic") — see
        # eval/cli.py::_condition_stds
        ds.source = source
    return splits


def load_vgmidi(args):
    d, r, n, a, v, c = get_vgmidi(
        vgmidi_dir=getattr(args, "vgmidi_dir", None))
    return {mode: VGMIDIDataset(d, r, n, c, a, v, mode=mode)
            for mode in ("train", "val", "test")}


def make_mesh(args):
    if not args.mesh:
        return None
    nd, nm = (int(x) for x in args.mesh.lower().split("x"))
    return mesh_lib.make_mesh(nd, nm)


def make_trainer(kind: str, cfg: ModelConfig, args) -> Trainer:
    """Build the trainer, resuming FULL state (params + optimizer + step)
    from the run's checkpoint dir if present. NB the reference persists only
    the state_dict, so its resume restarts KL annealing from step 0
    (SURVEY.md §5); resuming the step counter here is a deliberate fix."""
    spec = MODEL_REGISTRY[kind]
    params = None
    ckpt_dir = os.path.join(args.save_dir, spec["name"])
    if args.from_pt:
        params = load_pt_checkpoint(args.from_pt)
        print(f"Loaded torch checkpoint {args.from_pt}")
    trainer = Trainer(cfg, spec["init"], spec["losses"], mesh=make_mesh(args),
                      seed=args.seed, params=params)
    if not args.from_pt and os.path.isdir(ckpt_dir):
        try:
            state = restore_checkpoint(ckpt_dir, {
                "params": trainer.state.params,
                "opt_state": trainer.state.opt_state,
                "step": trainer.state.step})
            trainer.state = TrainState(state["params"], state["opt_state"],
                                       state["step"])
            trainer._host_step = int(state["step"])
            print(f"Loading {ckpt_dir} (resumed at step {trainer._host_step})")
        except Exception:
            # legacy params-only checkpoint: fresh optimizer/step
            params = restore_checkpoint(ckpt_dir, trainer.state.params)
            trainer.state = TrainState(params, trainer.state.opt_state,
                                       trainer.state.step)
            print(f"Loading {ckpt_dir} (params only; optimizer reset)")
    elif not args.from_pt:
        print(f"Save path: {ckpt_dir}")
    return trainer


def checkpoint_fn(kind: str, args) -> Callable[[TrainState, int], None]:
    spec = MODEL_REGISTRY[kind]
    os.makedirs(args.save_dir, exist_ok=True)
    ckpt_dir = os.path.join(args.save_dir, spec["name"])

    def save(state: TrainState, epoch: int):
        print("Saving model...")
        save_checkpoint(ckpt_dir, {"params": state.params,
                                   "opt_state": state.opt_state,
                                   "step": state.step})

    return save


def save_timestamped(kind: str, args, state: TrainState):
    spec = MODEL_REGISTRY[kind]
    stamp = datetime.now().isoformat().replace(":", "-")
    path = os.path.join(args.save_dir, f"{spec['name']}_{stamp}")
    save_checkpoint(path, {"params": state.params,
                           "opt_state": state.opt_state,
                           "step": state.step})
    print(f"Model saved as {path}!")


def _forward_for(kind: str, cfg: ModelConfig):
    """Model-appropriate forward for the reconstruction report."""

    def disentangled(fwd_fn):
        def f(params, rng, batch):
            x_oh = jax.nn.one_hot(batch["x"], cfg.roll_dims)
            r_oh = jax.nn.one_hot(batch["r"], cfg.rhythm_dims)
            n_oh = jax.nn.one_hot(batch["n"], cfg.note_dims)
            return fwd_fn(params, rng, x_oh, r_oh, n_oh, batch["c"], cfg)
        return f

    if kind in ("vanilla", "glsr"):
        return disentangled(models.reg_vae_forward), True
    if kind == "gmm":
        return disentangled(models.reg_gmvae_forward), True

    def conditioned(fwd_fn):
        def f(params, rng, batch):
            x_oh = jax.nn.one_hot(batch["x"], cfg.roll_dims)
            rd = batch["r_density"][:, None]
            nd = batch["n_density"][:, None]
            return fwd_fn(params, rng, x_oh, batch["c"], rd, nd, cfg)
        return f

    if kind in ("cvae", "fader"):
        return conditioned(models.cvae_forward if kind == "cvae"
                           else models.fader_forward), False

    def single(params, rng, batch):
        x_oh = jax.nn.one_hot(batch["x"], cfg.roll_dims)
        return models.single_vae_forward(params, rng, x_oh, batch["c"], cfg)

    return single, False


def run_training(kind: str, description: str, dual_corpus: bool = False,
                 argv=None) -> None:
    """The shared trainer main(): corpus -> fit (train+val per epoch,
    checkpoint per epoch + timestamped final) -> evaluation phase
    (CE/reg/accuracy on train+test), mirroring reference trainer.py:199-380."""
    from music_fader_nets_tpu.data.loader import shard_arrays_for_process
    from music_fader_nets_tpu.eval.reconstruction import reconstruction_report
    from music_fader_nets_tpu.utils.logging import MetricsLogger

    args = build_argparser(description).parse_args(argv)
    cfg = config_from_args(kind, args)
    trainer = make_trainer(kind, cfg, args)
    ck = checkpoint_fn(kind, args)
    logger = MetricsLogger(MODEL_REGISTRY[kind]["name"])
    yam = load_yamaha(args, cfg)
    print("Train / Validation / Test")
    print(len(yam["train"]), len(yam["val"]), len(yam["test"]))
    if jax.process_count() > 1:
        # multi-host: each process trains on its contiguous corpus shard
        print(f"multi-host: process {jax.process_index()}/"
              f"{jax.process_count()} keeps 1/{jax.process_count()} "
              "of each training split")

    vgm = None
    if not dual_corpus:
        trainer.fit(shard_arrays_for_process(yam["train"].arrays()),
                    shard_arrays_for_process(yam["val"].arrays()),
                    n_epochs=cfg.n_epochs, checkpoint_fn=ck,
                    metrics_logger=logger)
    else:
        vgm = load_vgmidi(args)
        print("VGMIDI: Train / Validation / Test")
        print(len(vgm["train"]), len(vgm["val"]), len(vgm["test"]))
        for epoch in range(1, cfg.n_epochs + 1):
            print(f"Epoch {epoch} / {cfg.n_epochs}")
            # supervised VGMIDI phase (batch 32, reference trainer_gmm.py:88)
            sup = trainer.run_epoch(
                shard_arrays_for_process(vgm["train"].arrays()),
                variant="supervised", seed=epoch, batch_size=32)
            sup_val = trainer.run_epoch(
                shard_arrays_for_process(vgm["val"].arrays()),
                variant="supervised", train=False, batch_size=32,
                shuffle=False)
            # unsupervised Yamaha phase
            uns = trainer.run_epoch(
                shard_arrays_for_process(yam["train"].arrays()), seed=epoch)
            uns_val = trainer.run_epoch(
                shard_arrays_for_process(yam["val"].arrays()), train=False,
                shuffle=False)
            print("vgmidi train - " + " ".join(
                f"{k}: {v:.4f}" for k, v in sorted(sup.items())))
            print("vgmidi val   - " + " ".join(
                f"{k}: {v:.4f}" for k, v in sorted(sup_val.items())))
            print("yamaha train - " + " ".join(
                f"{k}: {v:.4f}" for k, v in sorted(uns.items())))
            print("yamaha val   - " + " ".join(
                f"{k}: {v:.4f}" for k, v in sorted(uns_val.items())))
            for split, m in (("vgmidi_train", sup), ("vgmidi_val", sup_val),
                             ("yamaha_train", uns), ("yamaha_val", uns_val)):
                logger.log(m, step=trainer._host_step, epoch=epoch,
                           split=split)
            ck(trainer.state, epoch)
    save_timestamped(kind, args, trainer.state)

    # evaluation phase (reference trainer.py:280-376). For the dual-corpus
    # GM-VAE it also reports the VGMIDI supervised splits, including the
    # arousal-classification accuracy of the mixture posterior
    # (reference trainer_gmm.py:570-585, printed at :596-605 — the reference
    # print itself crashes on an undefined adversarial total, a known quirk)
    fwd, has_sub = _forward_for(kind, cfg)
    for split in ("train", "test"):
        rep = reconstruction_report(trainer.params, fwd,
                                    yam[split].arrays(), cfg,
                                    batch_size=min(cfg.batch_size,
                                                   len(yam[split])),
                                    has_subdecoders=has_sub)
        print(f"[{split}] " + " ".join(
            f"{k}: {v:.4f}" for k, v in sorted(rep.items())))
    if vgm is not None:
        for split in ("train", "test"):
            if len(vgm[split]) == 0:
                continue
            rep = reconstruction_report(trainer.params, fwd,
                                        vgm[split].arrays(), cfg,
                                        batch_size=min(32, len(vgm[split])),
                                        has_subdecoders=has_sub)
            print(f"[vgmidi {split}] " + " ".join(
                f"{k}: {v:.4f}" for k, v in sorted(rep.items())))
