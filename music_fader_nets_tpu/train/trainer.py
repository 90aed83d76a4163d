"""Generic trainer.

The reference has six ~80%-identical trainer scripts (SURVEY.md §2.3); here
one `Trainer` is parameterized by (init_fn, loss bundle(s), corpus). The
train step is a single jitted program: one-hot expansion, forward, loss,
grads, global-norm clip (1.0, reference trainer.py:157), Adam update — all
fused by XLA on device. With a mesh, params follow the TP layout and batches
are sharded over the `data` axis; GSPMD inserts the gradient all-reduce.
"""
from __future__ import annotations

import functools
import time
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from music_fader_nets_tpu.config import ModelConfig
from music_fader_nets_tpu.data.loader import batch_iterator
from music_fader_nets_tpu.models import fast as fast_lib
from music_fader_nets_tpu.parallel import mesh as mesh_lib


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array          # int32 scalar, drives KL annealing


def make_optimizer(cfg: ModelConfig) -> optax.GradientTransformation:
    """clip_by_global_norm(1.0) then Adam(lr) — matches the reference's
    `clip_grad_norm_(1)` + `optim.Adam(lr)` (trainer.py:49,157)."""
    return optax.chain(optax.clip_by_global_norm(1.0),
                       optax.adam(cfg.lr))


class Trainer:
    def __init__(self,
                 cfg: ModelConfig,
                 init_fn: Callable,
                 loss_fns: Dict[str, Callable],
                 mesh=None,
                 seed: int = 0,
                 params=None):
        """loss_fns: named loss bundles, e.g. {"default": vanilla_loss} or
        {"default": unsup_gmm, "supervised": sup_gmm} for the dual-corpus
        GM-VAE loop."""
        self.cfg = cfg
        self.mesh = mesh
        self.optimizer = make_optimizer(cfg)
        self.base_rng = jax.random.PRNGKey(seed)
        self._host_step = 0

        if params is None:
            params = init_fn(jax.random.PRNGKey(seed), cfg)
        opt_state = self.optimizer.init(params)
        state = TrainState(params, opt_state, jnp.zeros((), jnp.int32))
        if mesh is not None:
            state = TrainState(
                mesh_lib.shard_params(state.params, mesh),
                jax.device_put(state.opt_state,
                               mesh_lib.replicated(mesh)),
                jax.device_put(state.step, mesh_lib.replicated(mesh)))
        self.state = state

        self._loss_fns = dict(loss_fns)
        self._train_steps = {
            name: self._build_train_step(fn) for name, fn in loss_fns.items()}
        self._eval_steps = {
            name: self._build_eval_step(fn) for name, fn in loss_fns.items()}
        self._epoch_fns = {}

    # ------------------------------------------------------------------

    def _build_train_step(self, loss_fn):
        cfg = self.cfg
        optimizer = self.optimizer
        mesh = self.mesh

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, batch, rng):
            # expose the mesh to Pallas-dispatching ops during tracing
            # (pallas_call is not GSPMD-partitionable; see ops/gru.py)
            with mesh_lib.trace_mesh_scope(mesh):
                def lossf(params):
                    # kernel-layout view (models/fast.py); grads flow back
                    # through the stack/pad transpose — same program shape
                    # as stacking inside the forward
                    fp, _ = fast_lib.split_fast(params)
                    return loss_fn(fp, rng, batch, state.step, cfg)
                (loss, metrics), grads = jax.value_and_grad(
                    lossf, has_aux=True)(state.params)
                updates, opt_state = optimizer.update(grads, state.opt_state,
                                                      state.params)
                params = optax.apply_updates(state.params, updates)
                return TrainState(params, opt_state, state.step + 1), metrics

        return train_step

    def _build_eval_step(self, loss_fn):
        cfg = self.cfg
        mesh = self.mesh

        @jax.jit
        def eval_step(state: TrainState, batch, rng):
            # The reference evaluates with the model still in training mode
            # and no no_grad (trainer.py:232-252) — numerically the forward
            # is the same; we simply don't differentiate.
            with mesh_lib.trace_mesh_scope(mesh):
                fp, _ = fast_lib.split_fast(state.params)
                _, metrics = loss_fn(fp, rng, batch, state.step, cfg)
            return metrics

        return eval_step

    def _build_epoch_fn(self, loss_fn, train: bool):
        """Whole-epoch program: `lax.scan` over stacked batches inside ONE
        jit. On a tunneled/remote TPU this removes every per-step dispatch
        and host sync — the device runs the full epoch back-to-back and a
        single transfer returns the averaged metrics."""
        cfg = self.cfg
        optimizer = self.optimizer
        mesh = self.mesh

        # donate state only when it is consumed and returned (training);
        # eval returns the state untouched and must not invalidate it
        @functools.partial(jax.jit, donate_argnums=(0,) if train else ())
        def epoch_fn(state: TrainState, batches, rng):
            # Convert to the kernel param layout ONCE for the whole epoch
            # (models/fast.py): the scan carries pre-stacked/pre-padded
            # weights and Adam runs on them directly, so no step re-runs
            # the stack/pad fusions or their backward unstack slices
            # (~0.2 ms/step at reference dims). `template` is only read
            # for canonical shapes at exit.
            template = state.params
            fast_params, frozen = fast_lib.split_fast(state.params)
            if train:
                fast_opt, frozen_opt = fast_lib.opt_state_split_fast(
                    state.opt_state)
            else:
                fast_opt = state.opt_state
            fstate = TrainState(fast_params, fast_opt, state.step)

            def body(fstate, batch):
                rng_step = jax.random.fold_in(rng, fstate.step)

                def lossf(params):
                    return loss_fn(params, rng_step, batch, fstate.step, cfg)

                if train:
                    (loss, metrics), grads = jax.value_and_grad(
                        lossf, has_aux=True)(fstate.params)
                    updates, opt_state = optimizer.update(
                        grads, fstate.opt_state, fstate.params)
                    params = optax.apply_updates(fstate.params, updates)
                    return TrainState(params, opt_state,
                                      fstate.step + 1), metrics
                _, metrics = lossf(fstate.params)
                return fstate, metrics

            with mesh_lib.trace_mesh_scope(mesh):
                fstate, metrics = jax.lax.scan(body, fstate, batches)
            if train:
                state = TrainState(
                    fast_lib.merge_canonical(fstate.params, frozen, template),
                    fast_lib.opt_state_merge_canonical(
                        fstate.opt_state, frozen_opt, template),
                    fstate.step)
            return state, jax.tree_util.tree_map(jnp.mean, metrics)

        return epoch_fn

    # ------------------------------------------------------------------

    def _local_batch_size(self, bs: int) -> int:
        """Per-host batch rows. On multi-host meshes each process feeds only
        its addressable slice of the global batch (the corpus was already
        sharded per process by data.loader.shard_arrays_for_process), so
        host-side batches hold bs // process_count rows."""
        pc = jax.process_count()
        if self.mesh is None or pc <= 1:
            return bs
        if bs % pc:
            raise ValueError(f"global batch {bs} not divisible by "
                             f"process_count {pc}")
        return bs // pc

    def _place(self, batch, global_bs: Optional[int] = None):
        if self.mesh is None:
            return batch
        if jax.process_count() > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P
            sh = NamedSharding(self.mesh, P(mesh_lib.DATA_AXIS))
            gb = global_bs or self.cfg.batch_size
            return jax.tree_util.tree_map(
                lambda x: jax.make_array_from_process_local_data(
                    sh, np.asarray(x), (gb,) + x.shape[1:]), batch)
        return mesh_lib.shard_batch(batch, self.mesh)

    def _place_stacked(self, stacked, nb: int, bs: int):
        """Place (nb, B, ...) stacked epoch arrays on device (mesh-aware)."""
        if self.mesh is None:
            return jax.device_put(stacked)
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(self.mesh, P(None, mesh_lib.DATA_AXIS))
        if jax.process_count() > 1:
            # assemble global (nb, bs, ...) arrays from each host's
            # (nb, bs/pc, ...) slice — device_put would wrongly treat the
            # host-local slice as the global value
            return jax.tree_util.tree_map(
                lambda x: jax.make_array_from_process_local_data(
                    sh, x, (nb, bs) + x.shape[2:]), stacked)
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh),
                                      stacked)

    def _stack_epoch(self, arrays, bs, shuffle, seed):
        """(n_batches, B, ...) stacked epoch arrays (host-side gather)."""
        n = len(next(iter(arrays.values())))
        idx = np.arange(n)
        if shuffle:
            np.random.default_rng(seed).shuffle(idx)
        nb = n // bs
        sel = idx[: nb * bs]
        return {k: v[sel].reshape(nb, bs, *v.shape[1:])
                for k, v in arrays.items()}, nb

    def run_epoch(self, arrays, variant: str = "default", train: bool = True,
                  shuffle: bool = True, seed: Optional[int] = None,
                  batch_size: Optional[int] = None,
                  compiled: bool = True) -> Dict[str, float]:
        """One pass over `arrays`; returns per-batch-averaged metrics.

        compiled=True runs the whole epoch as one jitted `lax.scan` over the
        stacked batches (single dispatch, single host transfer) — the fast
        path on tunneled TPUs. compiled=False streams per-batch jitted steps
        (use when the epoch does not fit on device).
        """
        bs = batch_size or self.cfg.batch_size
        n_items = len(next(iter(arrays.values())))
        if n_items == 0:
            return {}
        # small split: one smaller batch. On multi-host, `arrays` holds this
        # process's shard, so the GLOBAL item count is n_items * process_count
        # — clamping against the local count would shrink the global batch
        # below what _local_batch_size later divides by.
        pc = jax.process_count() if self.mesh is not None else 1
        bs = min(bs, n_items * pc)
        bs_local = self._local_batch_size(bs)
        if compiled:
            stacked, nb = self._stack_epoch(arrays, bs_local, shuffle, seed)
            if nb == 0:
                return {}
            key = (variant, train, nb, bs)
            if key not in self._epoch_fns:
                self._epoch_fns[key] = self._build_epoch_fn(
                    self._loss_fns[variant], train)
            stacked = self._place_stacked(stacked, nb, bs)
            rng = jax.random.fold_in(self.base_rng, self._host_step)
            self._host_step += nb
            if train:
                self.state, metrics = self._epoch_fns[key](
                    self.state, stacked, rng)
            else:
                _, metrics = self._epoch_fns[key](self.state, stacked, rng)
            return {k: float(v) for k, v in jax.device_get(metrics).items()}

        step_fn = (self._train_steps if train else self._eval_steps)[variant]
        totals = None
        n = 0
        for batch in batch_iterator(arrays, bs_local, shuffle=shuffle,
                                    seed=seed):
            # host-side step counter for the RNG stream: avoids a device
            # sync per batch (reading state.step would stall the pipeline)
            rng = jax.random.fold_in(self.base_rng, self._host_step)
            self._host_step += 1
            batch = self._place(batch, global_bs=bs)
            if train:
                self.state, metrics = step_fn(self.state, batch, rng)
            else:
                metrics = step_fn(self.state, batch, rng)
            # accumulate ON DEVICE; one transfer at epoch end
            totals = metrics if totals is None else jax.tree_util.tree_map(
                jnp.add, totals, metrics)
            n += 1
        if totals is None:
            return {}
        totals = jax.device_get(totals)
        return {k: float(v) / n for k, v in totals.items()}

    def fit(self, train_arrays, val_arrays=None, n_epochs: Optional[int] = None,
            log_fn: Callable[[str], None] = print,
            checkpoint_fn: Optional[Callable[[TrainState, int], None]] = None,
            metrics_logger=None):
        n_epochs = n_epochs or self.cfg.n_epochs
        for epoch in range(1, n_epochs + 1):
            log_fn(f"Epoch {epoch} / {n_epochs}")
            t0 = time.time()
            tr = self.run_epoch(train_arrays, train=True, seed=epoch)
            lines = [f"train loss: {tr.get('loss', float('nan')):.4f}"
                     f"  ({time.time() - t0:.1f}s)"]
            ev = None
            if val_arrays is not None:
                ev = self.run_epoch(val_arrays, train=False, shuffle=False)
                lines.append(f"val loss: {ev.get('loss', float('nan')):.4f}")
            log_fn("  ".join(lines))
            log_fn("train by term - " + " ".join(
                f"{k}: {v:.4f}" for k, v in sorted(tr.items()) if k != "loss"))
            if metrics_logger is not None:
                metrics_logger.log(tr, step=self._host_step, epoch=epoch,
                                   split="train")
                if ev is not None:
                    metrics_logger.log(ev, step=self._host_step, epoch=epoch,
                                       split="val")
            if checkpoint_fn is not None:
                checkpoint_fn(self.state, epoch)
        return self.state

    # convenience ------------------------------------------------------

    @property
    def params(self):
        return self.state.params

    def compiled_step_time(self, arrays, variant: str = "default",
                           iters: int = 20,
                           batch_size: Optional[int] = None,
                           spread: bool = False):
        """Seconds/step of the compiled whole-epoch path (`run_epoch`
        compiled=True): `iters` train steps inside ONE jitted `lax.scan`,
        timed with a single host fetch. This is the path every trainer CLI
        runs, and unlike `steady_state_step_time` it contains no per-step
        host dispatch — on a tunneled TPU the dispatch RPC (1-10ms,
        load-dependent) otherwise swamps a ~7ms device step.

        Timing runs on a COPY of the trainer state (the epoch fn donates and
        advances it), so calling this never perturbs a live training run.
        Returns the best window; pass spread=True for (best, [window times]).
        """
        bs = batch_size or self.cfg.batch_size
        n = len(next(iter(arrays.values())))
        reps = (iters * bs + n - 1) // n
        if reps > 1:
            arrays = {k: np.concatenate([v] * reps)[: iters * bs]
                      for k, v in arrays.items()}
        else:
            arrays = {k: v[: iters * bs] for k, v in arrays.items()}
        stacked, nb = self._stack_epoch(arrays, bs, shuffle=False, seed=0)
        key = (variant, True, nb, bs)
        if key not in self._epoch_fns:
            self._epoch_fns[key] = self._build_epoch_fn(
                self._loss_fns[variant], True)
        fn = self._epoch_fns[key]
        # place the stacked batches on device ONCE, outside the timed
        # windows: passing host numpy would re-transfer the whole epoch
        # through the (slow, tunneled) host link on every call — measured
        # ~0.4 ms/step of pure transfer at nb=20, while a real training
        # epoch amortizes its one transfer over the full corpus
        stacked = self._place_stacked(stacked, nb, bs)
        rng = self.base_rng
        # fresh buffers: the epoch fn donates its state argument, so timing
        # on self.state directly would invalidate AND advance the live state
        state = jax.tree_util.tree_map(jnp.copy, self.state)
        state, metrics = fn(state, stacked, rng)        # compile + warm
        float(np.asarray(metrics["loss"]))              # real sync
        windows = []
        for _w in range(3):
            # chain 3 epoch programs per host fetch: the fetch itself is a
            # ~40ms tunnel RPC that would otherwise bias the per-step time
            t0 = time.perf_counter()
            for _c in range(3):
                state, metrics = fn(state, stacked, rng)
            float(np.asarray(metrics["loss"]))
            windows.append((time.perf_counter() - t0) / (3 * nb))
        best = min(windows)
        return (best, windows) if spread else best

    def steady_state_step_time(self, arrays, variant: str = "default",
                               warmup: int = 3, iters: int = 20,
                               batch_size: Optional[int] = None) -> float:
        """Amortized seconds/step after compilation.

        NB: on the tunneled TPU platform here, `block_until_ready` returns
        before execution finishes; the only trustworthy sync is a host read
        of a value that depends on the computation. Steps are chained
        (param data dependency) and a single scalar is fetched at the end,
        so the measurement reflects device throughput, not tunnel latency.
        """
        bs = batch_size or self.cfg.batch_size
        batches = [self._place(b) for b in
                   batch_iterator(arrays, bs, shuffle=False)][:8]
        step_fn = self._train_steps[variant]
        rng = self.base_rng
        for i in range(warmup):
            self.state, m = step_fn(self.state, batches[i % len(batches)], rng)
        float(m["loss"])                         # real sync
        # best of 3 windows: shields against transient chip/tunnel contention
        best = float("inf")
        for _w in range(3):
            t0 = time.perf_counter()
            for i in range(iters):
                self.state, m = step_fn(self.state,
                                        batches[i % len(batches)], rng)
            float(m["loss"])                     # real sync
            best = min(best, (time.perf_counter() - t0) / iters)
        return best
