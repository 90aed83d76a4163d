"""Controllability evaluation: consistency / restrictiveness / monotonicity
(paper Table 1; reference test_class.py:73-322).

Metric definitions replicate the reference exactly:
  * monotonicity  = R^2 of LinearRegression(attribute vs slider value)
                    (test_class.py:268-272),
  * consistency   = 1 - avg std across samples at the same slider value,
                    densities normalized by the dataset std
                    (test_class.py:170-174, 259-260),
  * restrictiveness = 1 - avg std of the NON-target attribute across slider
                    values (test_class.py:174, 265-266),
reported mean +/- std over `epochs` repetitions.

TPU restructuring (SURVEY.md hard part #4): the reference decodes one
(sample, slider-value) pair at a time and round-trips each output through a
MIDI file on disk (test_class.py:125-137). Here ALL samples x 8 slider
values are decoded in ONE jitted batch, and the token -> notes -> pianoroll
-> attributes round trip runs in memory (identical attribute semantics, no
file I/O).
"""
from __future__ import annotations

import collections
import dataclasses
import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from music_fader_nets_tpu.config import ModelConfig
from music_fader_nets_tpu.ops.sampling import reparameterize
from music_fader_nets_tpu.tokenizer.pipeline import attributes_from_tokens

EOS = 1

# process-wide jit wrapper cache: jax.jit(f) twice yields two wrappers with
# INDEPENDENT compile caches, so per-evaluator jitting would recompile the
# same program for every evaluator instance (expensive on a tunneled TPU).
# LRU-bounded: keys are often fresh closures (capturing full model params),
# so an unbounded dict would pin every evaluated checkpoint's params and
# executables for process lifetime.
_JIT_CACHE: "collections.OrderedDict" = collections.OrderedDict()
_JIT_CACHE_MAX = 16


def _jit_cached(fn, **jit_kwargs):
    key = (fn, tuple(sorted(jit_kwargs.items())))
    if key not in _JIT_CACHE:
        _JIT_CACHE[key] = jax.jit(fn, **jit_kwargs)
        while len(_JIT_CACHE) > _JIT_CACHE_MAX:
            _JIT_CACHE.popitem(last=False)
    else:
        _JIT_CACHE.move_to_end(key)
    return _JIT_CACHE[key]


@functools.partial(jax.jit, static_argnames=("decode", "steps"))
def _argmax_decode(params, z, decode, steps):
    """One module-level jit for all argmax-decode paths; the model's decode
    fn and step count are static so compiles cache per (decode, steps)."""
    return jnp.argmax(decode(params, z, steps), axis=-1)


def clean_output(logp_or_tokens) -> np.ndarray:
    """argmax -> strip leading/trailing zeros -> truncate at first EOS
    (reference test_class.py:44-50)."""
    arr = np.asarray(logp_or_tokens)
    tokens = arr if arr.ndim == 1 else np.argmax(arr, axis=-1)
    tokens = np.trim_zeros(tokens)
    if EOS in tokens:
        last = int(np.argwhere(tokens == EOS)[0][0])
        tokens = np.where(tokens == EOS, 0, tokens)[:last]
    return tokens


def get_classes(rhythm, note) -> Tuple[float, float, int, int]:
    """Densities + 3-class buckets (reference test_class.py:59-70)."""
    rhythm = np.asarray(rhythm)
    r_density = float((rhythm == 1).sum() / len(rhythm))
    c_r = 0 if r_density < 0.3 else (1 if r_density < 0.5 else 2)
    note = np.asarray(note)
    n_density = float(note.sum() / len(note))
    c_n = 0 if n_density <= 2 else (1 if n_density <= 3.5 else 2)
    return r_density, n_density, c_r, c_n


def _r2(x: np.ndarray, y: np.ndarray) -> float:
    """R^2 of a 1-D least-squares fit — equals sklearn LinearRegression's
    `.score` for a single feature."""
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    vx = x - x.mean()
    vy = y - y.mean()
    ss_tot = float((vy * vy).sum())
    if ss_tot == 0.0:
        # constant target: sklearn's LinearRegression fits intercept=mean,
        # slope=0, so residuals are exactly 0 and `.score` returns 1.0
        # (r2_score's nonzero_numerator & ~nonzero_denominator rule) —
        # mirror that convention (reference test_class.py:268-272)
        return 1.0
    denom = float((vx * vx).sum())
    slope = float((vx * vy).sum()) / denom if denom > 0 else 0.0
    resid = y - (y.mean() + slope * vx)
    return 1.0 - float((resid * resid).sum()) / ss_tot


def latent_stats(encode_batched: Callable, arrays: Dict[str, np.ndarray],
                 cfg: ModelConfig, batch_size: int = 128,
                 rng: Optional[jax.Array] = None) -> Dict[str, float]:
    """Full-corpus encode: z[:,0] ranges per stream + attribute stds — the
    `run_through`/`train_test_evaluation` pass of the reference eval scripts
    (test_vanilla_v2.py:20-100)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    # cached jit (eager scans are RPC storms): a fresh jax.jit wrapper per
    # call would recompile the corpus-encode program on every invocation
    encode_batched = _jit_cached(encode_batched)
    z_r0, z_n0 = [], []
    n = len(arrays["x"])
    batch_size = min(batch_size, n)
    # full-corpus stats: the final partial batch is consumed too (the
    # reference's DataLoader has drop_last=False) at the cost of one extra
    # compile for the tail shape
    for s in range(0, n, batch_size):
        batch = {k: v[s: s + batch_size] for k, v in arrays.items()}
        zr, zn = encode_batched(batch, jax.random.fold_in(rng, s))
        z_r0.append(np.asarray(zr[:, 0]))
        z_n0.append(np.asarray(zn[:, 0]))
    z_r0 = np.concatenate(z_r0) if z_r0 else np.zeros(1)
    z_n0 = np.concatenate(z_n0) if z_n0 else np.zeros(1)
    return {
        "z_r_min": float(z_r0.min()), "z_r_max": float(z_r0.max()),
        "z_n_min": float(z_n0.min()), "z_n_max": float(z_n0.max()),
        "r_std": float(np.std(arrays["r_density"])),
        "n_std": float(np.std(arrays["n_density"])),
    }


def latent_monotonicity(encode_batched: Callable, arrays: Dict[str, np.ndarray],
                        cfg: ModelConfig, batch_size: int = 128,
                        rng: Optional[jax.Array] = None) -> Dict[str, float]:
    """z-space monotonicity: R^2 of the regularized latent dimension against
    the attribute, measured directly on the encoder outputs over the corpus
    (reference test_singlevae_v2.py:311-330)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    encode_batched = _jit_cached(encode_batched)
    z_r0, z_n0, rd, nd = [], [], [], []
    n = len(arrays["x"])
    batch_size = min(batch_size, n)
    for s in range(0, n, batch_size):      # tail batch included
        batch = {k: v[s: s + batch_size] for k, v in arrays.items()}
        zr, zn = encode_batched(batch, jax.random.fold_in(rng, s))
        z_r0.append(np.asarray(zr[:, 0]))
        z_n0.append(np.asarray(zn[:, 0]))
        rd.append(batch["r_density"])
        nd.append(batch["n_density"])
    if not z_r0:
        return {}
    return {
        "z_r_monotonicity": _r2(np.concatenate(z_r0), np.concatenate(rd)),
        "z_n_monotonicity": _r2(np.concatenate(z_n0), np.concatenate(nd)),
    }


@dataclasses.dataclass
class EvalScores:
    consistency: Tuple[float, float]
    restrictiveness: Tuple[float, float]
    monotonicity: Tuple[float, float]

    def report(self) -> str:
        return ("============================================\n"
                f"Consistency: {self.consistency[0]} +/- {self.consistency[1]}\n"
                f"Restrictiveness: {self.restrictiveness[0]} +/- {self.restrictiveness[1]}\n"
                f"Monotonicity: {self.monotonicity[0]} +/- {self.monotonicity[1]}\n"
                "============================================")


class ControllabilityEvaluator:
    """Latent-sliding evaluator for the disentangled models (RegVAE, GLSR
    variant, RegGMVAE) — shifts z_r[:,0] or z_n[:,0]
    (reference test_class.py:226-322, test_gmm_v2.py:27-50)."""

    def __init__(self, params, cfg: ModelConfig,
                 encode: Callable,        # (params, x_oh) -> ((mu,std),(mu,std))
                 decode: Callable,        # (params, z_full, steps) -> logp
                 target: str = "rhythm",
                 epochs: int = 2, num_of_samples: int = 20,
                 decode_steps: int = 100, seed: int = 0,
                 verbose: bool = True,
                 decode_tokens: Optional[Callable] = None,
                 sample_z: bool = True):
        """decode_tokens: optional (params, z_full, steps) -> int tokens
        fast path (the Pallas VMEM-resident kernel); defaults to argmax over
        `decode`'s log-probs.

        sample_z: True (reference-faithful, test_class.py:233-254 calls
        `repar` on the posterior) draws z ~ q(z|x); False uses the posterior
        MEAN, removing the sampling noise that inflates consistency variance
        (the non-target latent dims then depend only on the input)."""
        self.params, self.cfg = params, cfg
        # jit the encoder (cached process-wide): its scans would otherwise
        # build eagerly, one RPC per op on a tunneled TPU
        self.encode, self.decode = _jit_cached(encode), decode
        self.target = target
        self.epochs, self.num_of_samples = epochs, num_of_samples
        self.decode_steps = decode_steps
        self.rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed)
        self.verbose = verbose
        self.sample_z = sample_z
        if decode_tokens is not None:
            # decode_tokens paths are module-level jits already — wrapping
            # them again would nest jits and defeat the compile cache
            self._decode_jit = (
                lambda p, z: decode_tokens(p, z, decode_steps))
        else:
            self._decode_jit = (
                lambda p, z: _argmax_decode(p, z, decode, decode_steps))

    # -- latent construction ------------------------------------------------

    def _draw(self, key, mu, std):
        return reparameterize(key, mu, std) if self.sample_z else mu

    def _z_batch_many(self, items: Dict[str, np.ndarray], values: np.ndarray,
                      key) -> jax.Array:
        """S test items -> (S*8, z_total) rows, target dim swept per item;
        rows are grouped per sample (sample-major)."""
        V8 = len(values)
        x_oh = jax.nn.one_hot(items["x"], self.cfg.roll_dims)
        (mu_r, std_r), (mu_n, std_n) = self.encode(self.params, x_oh)
        kr, kn = jax.random.split(key)
        z_r = jnp.repeat(self._draw(kr, mu_r, std_r), V8, axis=0)
        z_n = jnp.repeat(self._draw(kn, mu_n, std_n), V8, axis=0)
        vals = jnp.tile(jnp.asarray(values, z_r.dtype), len(items["x"]))
        if self.target == "rhythm":
            z_r = z_r.at[:, 0].set(vals)
        else:
            z_n = z_n.at[:, 0].set(vals)
        c = jnp.repeat(jnp.asarray(items["c"]), V8, axis=0)
        return jnp.concatenate([z_r, z_n, c.astype(z_r.dtype)], axis=-1)

    # -- device decode --------------------------------------------------------

    # Pad granularity — the op's own chunk size (the measured winner per
    # benchmarks/decode_crossover.py). The kernel path auto-chunks large
    # batches inside the op; padding waves to a multiple of its chunk here
    # just keeps the SCAN fallback's compile set bounded (wave sizes vary
    # per retry round). Imported, not duplicated, so a retune of the op's
    # chunk can't silently diverge from the eval pad granularity.
    from music_fader_nets_tpu.ops.pallas_decode import _CHUNK

    def _decode_all(self, z_full) -> np.ndarray:
        """(M, z_total) -> (M, steps) int tokens, in one decode call
        (the op handles kernel chunking internally)."""
        z_full = np.asarray(z_full)
        M, zt = z_full.shape
        if M == 0:
            return np.zeros((0, self.decode_steps), np.int32)
        pad = (-M) % self._CHUNK
        if pad:
            z_full = np.concatenate(
                [z_full, np.zeros((pad, zt), z_full.dtype)])
        toks = np.asarray(self._decode_jit(self.params, jnp.asarray(z_full)))
        return toks[:M]

    # -- main loop ----------------------------------------------------------

    def evaluate(self, arrays: Dict[str, np.ndarray], min_val: float,
                 max_val: float, r_std: float, n_std: float) -> EvalScores:
        """Metric semantics are the reference's exactly (test_class.py:79-194);
        the restructuring is batching: every wave of samples x 8 slider
        values decodes as chunked device batches, and the token->attribute
        round trip runs on host afterwards."""
        c_lst, r_lst, m_lst = [], [], []
        n_items = len(arrays["x"])
        gap = (max_val - min_val) / 8
        values = np.array([min_val + k * gap for k in range(8)])
        V8 = len(values)

        for _ in range(self.epochs):
            r_all, n_all, mono = [], [], []
            attempts = 0
            while len(mono) < self.num_of_samples and \
                    attempts < 4 * self.num_of_samples:
                wave = min(self.num_of_samples - len(mono),
                           4 * self.num_of_samples - attempts)
                attempts += wave
                idx = self.rng.integers(0, n_items, size=wave)
                items = {k: v[idx] for k, v in arrays.items()}
                self.key, sub = jax.random.split(self.key)
                z_full = self._z_batch_many(items, values, sub)
                tokens = self._decode_all(z_full)        # (wave*8, steps)

                for si in range(wave):
                    r_row, n_row = [], []
                    for k in range(V8):
                        res = attributes_from_tokens(
                            clean_output(tokens[si * V8 + k]))
                        if res is None:
                            break
                        rhythm, note = res
                        rd, nd, _, _ = get_classes(rhythm, note)
                        r_row.append(rd)
                        n_row.append(nd)
                    if len(r_row) < V8:
                        continue               # discard, like the reference
                    r_all.append(r_row)
                    n_all.append(n_row)
                    tgt = r_row if self.target == "rhythm" else n_row
                    mono.append(_r2(values, np.array(tgt)))

            if not r_all:
                # no sample survived the token->attribute round trip this
                # epoch (degenerate checkpoint decoding nothing parseable).
                # The reference would feed empty arrays into np.std and
                # print nan-with-warnings; make the nan explicit instead.
                if self.verbose:
                    print("WARNING: every sample discarded this epoch "
                          "(no decode parsed back to attributes)")
                c_lst.append(float("nan"))
                r_lst.append(float("nan"))
                m_lst.append(float("nan"))
                continue
            r_all = np.array(r_all) / r_std
            n_all = np.array(n_all) / n_std
            if self.target == "rhythm":
                consistency = 1 - np.average(np.std(r_all, axis=0))
                restrictiveness = 1 - np.average(np.std(n_all, axis=-1))
            else:
                consistency = 1 - np.average(np.std(n_all, axis=0))
                restrictiveness = 1 - np.average(np.std(r_all, axis=-1))
            monotonicity = float(np.mean(mono)) if mono else 0.0
            if self.verbose:
                print("Generator consistency: ", consistency)
                print("Generator restrictiveness: ", restrictiveness)
                print("Generator monotonicity:", monotonicity)
            c_lst.append(consistency)
            r_lst.append(restrictiveness)
            m_lst.append(monotonicity)

        scores = EvalScores(
            (float(np.mean(c_lst)), float(np.std(c_lst))),
            (float(np.mean(r_lst)), float(np.std(r_lst))),
            (float(np.mean(m_lst)), float(np.std(m_lst))))
        if self.verbose:
            print(scores.report())
        return scores


class SingleVAEControllabilityEvaluator(ControllabilityEvaluator):
    """Shifts dim 0 (rhythm) / dim 1 (note) of the single latent
    (reference test_singlevae_v2.py:195,241)."""

    def _z_batch_many(self, items, values, key):
        V8 = len(values)
        x_oh = jax.nn.one_hot(items["x"], self.cfg.roll_dims)
        mu, std = self.encode(self.params, x_oh)
        z = jnp.repeat(self._draw(key, mu, std), V8, axis=0)
        vals = jnp.tile(jnp.asarray(values, z.dtype), len(items["x"]))
        dim = 0 if self.target == "rhythm" else 1
        z = z.at[:, dim].set(vals)
        c = jnp.repeat(jnp.asarray(items["c"]), V8, axis=0)
        return jnp.concatenate([z, c.astype(z.dtype)], axis=-1)


class ConditionControllabilityEvaluator(ControllabilityEvaluator):
    """CVAE / FaderNets: sweeps the decoder CONDITION value k/8 instead of a
    latent dimension (reference test_cvae_v2.py:37,74-78). The dataset stds
    the reference hard-codes (test_cvae_v2.py:120-121) are the defaults via
    the caller."""

    def _z_batch_many(self, items, values, key):
        V8 = len(values)
        x_oh = jax.nn.one_hot(items["x"], self.cfg.roll_dims)
        rd = jnp.asarray(items["r_density"], jnp.float32)[:, None]
        nd = jnp.asarray(items["n_density"], jnp.float32)[:, None]
        mu, std = self.encode(self.params, x_oh, rd, nd)
        z = jnp.repeat(self._draw(key, mu, std), V8, axis=0)
        vals = jnp.tile(jnp.asarray(values, z.dtype),
                        len(items["x"]))[:, None]
        rd_col = jnp.repeat(rd, V8, axis=0).astype(z.dtype)
        nd_col = jnp.repeat(nd, V8, axis=0).astype(z.dtype)
        if self.target == "rhythm":
            rd_col = vals
        else:
            nd_col = vals
        return jnp.concatenate([z, rd_col, nd_col], axis=-1)
