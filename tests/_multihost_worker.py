"""Multi-host execution worker: one PROCESS of a 2-process CPU cluster.

Launched by tests/test_sharding.py::test_multihost_two_process_epoch (slow).
Each process owns `--local-devices` virtual CPU devices, initializes
`jax.distributed`, shards the synthetic corpus with
`data.loader.shard_arrays_for_process`, and runs one compiled training epoch
plus one small-split eval epoch through the Trainer's multi-process feeding
path (`make_array_from_process_local_data`, train/trainer.py). Prints one
JSON line of metrics for the parent test to compare against a single-process
reference run.
"""
import argparse
import json
import os
import sys


def corpus_arrays(n, cfg):
    """Deterministic synthetic corpus as the trainer's array dict (shared by
    the workers and the parent test's single-process reference run)."""
    import numpy as np
    from music_fader_nets_tpu.data.synthetic import synth_corpus
    data, rhythm, note, chroma = synth_corpus(n, cfg.seq_len, cfg.attr_len)
    return {
        "x": data.astype(np.int32), "r": rhythm.astype(np.int32),
        "n": note.astype(np.int32), "c": chroma.astype(np.float32),
        "r_density": (rhythm == 1).mean(-1).astype(np.float32),
        "n_density": note.mean(-1).astype(np.float32),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--corpus-size", type=int, default=64)
    ap.add_argument("--val-size", type=int, default=16)
    ap.add_argument("--batch-size", type=int, default=16)
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.local_devices}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)
    assert jax.process_count() == args.num_processes, jax.process_count()
    assert len(jax.devices()) == args.num_processes * args.local_devices

    from music_fader_nets_tpu.config import ModelConfig
    from music_fader_nets_tpu import models
    from music_fader_nets_tpu.data.loader import shard_arrays_for_process
    from music_fader_nets_tpu.parallel import mesh as mesh_lib
    from music_fader_nets_tpu.train import Trainer
    from music_fader_nets_tpu.train.objectives import vanilla_loss

    cfg = ModelConfig(hidden_dims=16, z_dims=8, seq_len=12, attr_len=4,
                      batch_size=args.batch_size)
    # every host builds the same corpus (same seed), then keeps its shard
    full = corpus_arrays(args.corpus_size + args.val_size, cfg)
    train = {k: v[: args.corpus_size] for k, v in full.items()}
    val = {k: v[args.corpus_size:] for k, v in full.items()}
    train = shard_arrays_for_process(train)
    val = shard_arrays_for_process(val)

    mesh = mesh_lib.make_mesh(len(jax.devices()), 1)
    tr = Trainer(cfg, models.init_reg_vae, {"default": vanilla_loss},
                 mesh=mesh, seed=0)
    m_train = tr.run_epoch(train, train=True, shuffle=False)
    # val split smaller than the global batch: exercises the small-split
    # clamp against the GLOBAL item count
    m_val = tr.run_epoch(val, train=False, shuffle=False)
    print("MULTIHOST_RESULT " + json.dumps(
        {"process": args.process_id,
         "train_loss": m_train["loss"], "val_loss": m_val["loss"]}),
        flush=True)


if __name__ == "__main__":
    sys.exit(main())
