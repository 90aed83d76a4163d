"""Released-artifact parity harness.

One command to validate this framework against the reference's released
artifacts the moment they are available (the six `.pt` checkpoints listed in
the reference's `.MISSING_LARGE_BLOBS`, the Yamaha `data/values_v3/*.npy`
caches (ptb_v2.py:336-339) and the VGMIDI `song_tokens.npy`
(ptb_v2.py:375-379)):

  python parity.py --from-pt params/music_attr_vae_reg_gmm.pt \
                   --data-dir data/values_v3 --tokens song_tokens.npy

Runs, in order (each section prints PASS/FAIL and the command exits nonzero
on any failure):

  1. converter round trip — .pt state_dict -> param pytree -> state_dict,
     every tensor equal at 1e-6 (bit-level converter structural check).
  2. forward parity — a torch-functional replica of the reference forward
     paths is built from the SAME state_dict (shapes inferred, nothing
     hard-coded) and compared against our encoder / sub-decoders /
     teacher-forced global decoder at atol 1e-4, the converter contract
     pinned by tests/test_checkpoint.py.
  3. Table-1 controllability eval at the reference workloads through the
     public eval CLI machinery (real corpus via --data-dir; synthetic
     stand-ins otherwise).
  4. token-stream re-encode — every row of song_tokens.npy is decoded to
     notes and re-encoded with our native MidiPerformance codec; reports the
     exact-match rate (SURVEY.md §7 hard part 6: match the Magenta fork).

Model family is inferred from the checkpoint filename (--kind overrides).

Sweep mode — the moment the whole released `params/` directory appears,
one command validates all six checkpoints and prints a summary table
(nonzero exit on any MISSING or FAIL):

  python parity.py --params-dir params/ --data-dir data/values_v3
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

# forward-parity comparisons need full-precision matmuls regardless of the
# backend default (TPU defaults to bf16-ish matmul precision)
import jax
jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp  # noqa: E402

KINDS = ("singlevae", "vanilla", "gmm", "glsr", "cvae", "fader")

# the six released checkpoints, exactly as named in the reference's
# .MISSING_LARGE_BLOBS manifest (reference README.md:34: "Some pre-trained
# models are attached in the `params` folder")
RELEASED_CKPTS = (
    ("music_attr_vae_reg_vanilla.pt", "vanilla"),
    ("music_attr_vae_reg_gmm.pt", "gmm"),
    ("music_attr_vae_reg_glsr.pt", "glsr"),
    ("music_attr_vae_reg_cvae.pt", "cvae"),
    ("music_attr_fader.pt", "fader"),
    ("music_attr_vae_reg_singlevae.pt", "singlevae"),
)


def infer_kind(path: str) -> str:
    base = os.path.basename(path).lower()
    for kind in KINDS:               # singlevae before vanilla ("vae" clash)
        if kind in base:
            return kind
    raise SystemExit(f"cannot infer model kind from {path!r}; pass --kind")


# ---------------------------------------------------------------------------
# torch-functional replicas (built from the state_dict, shapes inferred)
# ---------------------------------------------------------------------------


def _torch_gru(sd, prefix):
    import torch
    w = sd[f"{prefix}.weight_ih_l0"]
    H, I = w.shape[0] // 3, w.shape[1]
    bidir = f"{prefix}.weight_ih_l0_reverse" in sd
    g = torch.nn.GRU(I, H, batch_first=True, bidirectional=bidir)
    g.load_state_dict({k[len(prefix) + 1:]: v for k, v in sd.items()
                       if k.startswith(prefix + ".")})
    return g, H, I


def _lin(sd, prefix, x):
    import torch.nn.functional as F
    return F.linear(x, sd[f"{prefix}.weight"], sd[f"{prefix}.bias"])


def _torch_grucell(sd, prefix):
    import torch
    w = sd[f"{prefix}.weight_ih"]
    H, I = w.shape[0] // 3, w.shape[1]
    c = torch.nn.GRUCell(I, H)
    c.load_state_dict({k[len(prefix) + 1:]: v for k, v in sd.items()
                       if k.startswith(prefix + ".")})
    return c


def _torch_bigru_encode(sd, gru_prefix, mu_prefix, var_prefix, x):
    """Reference encoder path: bi-GRU final states -> mu / exp(var)
    (reference model_v2.py:81-97)."""
    g, _, _ = _torch_gru(sd, gru_prefix)
    h = g(x)[-1].transpose(0, 1).reshape(x.shape[0], -1)
    return _lin(sd, mu_prefix, h), _lin(sd, var_prefix, h).exp()


def _torch_sub_decoder(sd, stream, attr_oh, z):
    """Reference sub-decoder: teacher-forced GRU over [attr_oh, z-repeat],
    h0 = linear_init(z), log_softmax over dim=1 — the reference's TIME-axis
    quirk (model_v2.py:99-116)."""
    import torch
    import torch.nn.functional as F
    g, _, _ = _torch_gru(sd, f"gru_d_{stream}")
    zrep = z.unsqueeze(1).expand(-1, attr_oh.shape[1], -1)
    h0 = _lin(sd, f"linear_init_{stream}", z).unsqueeze(0)
    o = g(torch.cat([attr_oh, zrep], -1), h0)[0]
    return F.log_softmax(_lin(sd, f"linear_out_{stream}", o), 1)


def _torch_teacher_decode(sd, z, x_oh):
    """Reference global_decoder loop, teacher-forced (model_v2.py:118-143)."""
    import torch
    import torch.nn.functional as F
    B, T, V = x_oh.shape
    cell1 = _torch_grucell(sd, "grucell_g")
    cell2 = _torch_grucell(sd, "grucell_g_2")
    out = torch.zeros(B, V)
    out[:, -1] = 1.0
    h1 = _lin(sd, "linear_init_global", z)
    h2 = None
    logps = []
    for i in range(T):
        h1 = cell1(torch.cat([out, z], 1), h1)
        h2 = h1 if i == 0 else h2
        h2 = cell2(h1, h2)
        logps.append(F.log_softmax(_lin(sd, "linear_out_g", h2), 1))
        out = x_oh[:, i]
    return torch.stack(logps, 1)


# ---------------------------------------------------------------------------
# sections
# ---------------------------------------------------------------------------


def check_roundtrip(sd) -> bool:
    from music_fader_nets_tpu.utils.checkpoint import (
        convert_torch_state_dict, params_to_torch_state_dict,
    )
    params = convert_torch_state_dict(sd)
    back = params_to_torch_state_dict(params)
    ref = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                         else v) for k, v in sd.items()}
    ok = set(ref) == set(back)
    if not ok:
        print("  key sets differ:", set(ref) ^ set(back))
    for k in sorted(set(ref) & set(back)):   # report FAIL, don't KeyError
        if not np.allclose(ref[k], back[k], atol=1e-6):
            print(f"  mismatch at {k}: max|d|="
                  f"{np.abs(ref[k] - back[k]).max():.3g}")
            ok = False
    print(f"[1] converter round trip ({len(ref)} tensors):",
          "PASS" if ok else "FAIL")
    return ok


def check_forward(sd, kind: str, atol: float = 1e-4) -> bool:
    import torch
    from music_fader_nets_tpu import models
    from music_fader_nets_tpu.models.modules import (
        global_decoder_teacher, sub_decoder_apply,
    )
    from music_fader_nets_tpu.models.vae import _global_view, _sub_view
    from music_fader_nets_tpu.utils.checkpoint import convert_torch_state_dict

    params = convert_torch_state_dict(sd)
    torch.manual_seed(0)
    ok = True

    def close(name, got, ref):
        nonlocal ok
        d = float(np.abs(np.asarray(got) - ref.detach().numpy()).max())
        good = d <= atol
        ok = ok and good
        print(f"  {name}: max|d|={d:.2e}", "" if good else f"> {atol} FAIL")

    V = None
    with torch.no_grad():
        if kind in ("vanilla", "glsr", "gmm"):
            V = sd["gru_r.weight_ih_l0"].shape[1]
            x = torch.randn(3, 12, V)
            xj = jnp.asarray(x.numpy())
            (mu_r, std_r), (mu_n, std_n) = models.reg_vae_encode(params, xj)
            for s, mu, std in (("r", mu_r, std_r), ("n", mu_n, std_n)):
                mu_t, std_t = _torch_bigru_encode(
                    sd, f"gru_{s}", f"mu_{s}", f"var_{s}", x)
                close(f"encoder mu_{s}", mu, mu_t)
                close(f"encoder std_{s}", std, std_t)
            Z = sd["mu_r.weight"].shape[0]
            for s, dims in (("r", sd["linear_out_r.weight"].shape[0]),
                            ("n", sd["linear_out_n.weight"].shape[0])):
                z = torch.randn(3, Z)
                a = torch.nn.functional.one_hot(
                    torch.randint(0, dims, (3, 8)), dims).float()
                got = sub_decoder_apply(_sub_view(params, s),
                                        jnp.asarray(a.numpy()),
                                        jnp.asarray(z.numpy()), True)
                close(f"sub_decoder_{s}", got, _torch_sub_decoder(sd, s, a, z))
        elif kind == "singlevae":
            V = sd["gru.weight_ih_l0"].shape[1]
            x = torch.randn(3, 12, V)
            mu, std = models.single_vae_encode(params, jnp.asarray(x.numpy()))
            mu_t, std_t = _torch_bigru_encode(sd, "gru", "mu", "var", x)
            close("encoder mu", mu, mu_t)
            close("encoder std", std, std_t)
        elif kind == "cvae":
            VI = sd["gru_e.weight_ih_l0"].shape[1]   # V + 2 condition dims
            V = VI - 2
            x = torch.randn(3, 12, V)
            rd, nd = torch.rand(3, 1), torch.rand(3, 1)
            mu, std = models.cvae_encode(params, jnp.asarray(x.numpy()),
                                         jnp.asarray(rd.numpy()),
                                         jnp.asarray(nd.numpy()))
            cond = torch.cat([rd, nd], -1).unsqueeze(1).expand(-1, 12, -1)
            mu_t, std_t = _torch_bigru_encode(
                sd, "gru_e", "mu", "var", torch.cat([x, cond], -1))
            close("encoder mu", mu, mu_t)
            close("encoder std", std, std_t)
        elif kind == "fader":
            V = sd["gru_e.weight_ih_l0"].shape[1]
            x = torch.randn(3, 12, V)
            mu, std = models.fader_encode(params, jnp.asarray(x.numpy()))
            mu_t, std_t = _torch_bigru_encode(sd, "gru_e", "mu", "var", x)
            close("encoder mu", mu, mu_t)
            close("encoder std", std, std_t)

        # the global decoder is common to every family
        zt = sd["linear_init_global.weight"].shape[1]
        V = sd["linear_out_g.weight"].shape[0]
        z = torch.randn(3, zt)
        x_oh = torch.nn.functional.one_hot(
            torch.randint(0, V, (3, 7)), V).float()
        got = global_decoder_teacher(_global_view(params),
                                     jnp.asarray(z.numpy()),
                                     jnp.asarray(x_oh.numpy()))
        close("global teacher decode", got, _torch_teacher_decode(sd, z, x_oh))

        if kind == "gmm" and "mu_r_lookup.weight" in sd:
            for tbl in ("mu_r_lookup", "mu_n_lookup",
                        "logvar_r_lookup", "logvar_n_lookup"):
                if f"{tbl}.weight" in sd:
                    close(f"mixture table {tbl}", params[tbl],
                          sd[f"{tbl}.weight"])

    print(f"[2] forward parity vs torch replica ({kind}):",
          "PASS" if ok else "FAIL")
    return ok


def run_table1_eval(kind: str, args) -> bool:
    from music_fader_nets_tpu.eval.cli import run_evaluation
    argv = ["--from-pt", args.from_pt, "--synthetic-size",
            str(args.synthetic_size)]
    if args.data_dir:
        argv += ["--data-dir", args.data_dir]
    if args.platform:
        argv += ["--platform", args.platform]
    if args.samples:
        argv += ["--samples", str(args.samples)]
    if args.eval_epochs:
        argv += ["--eval-epochs", str(args.eval_epochs)]
    if args.decode_steps:
        argv += ["--decode-steps", str(args.decode_steps)]
    try:
        run_evaluation(kind, f"parity Table-1 eval ({kind})", argv=argv)
        print("[3] Table-1 eval at reference workloads: PASS (scores above)")
        return True
    except Exception as e:                     # surface, don't swallow
        print(f"[3] Table-1 eval: FAIL ({e!r})")
        return False


def check_token_stream(tokens_path: str, limit: int) -> bool:
    """Decode -> re-encode every row of the released token array and compare
    (reference ptb_v2.py:375-379 fixture; our codec must reproduce the
    Magenta fork's stream)."""
    from music_fader_nets_tpu.tokenizer.performance_codec import (
        EOS, performance_decode, performance_encode, token_role,
    )

    def fmt(window):
        return " ".join(f"{t}:{token_role(t)}" for t in window)

    rows = np.load(tokens_path, allow_pickle=True)
    n = len(rows) if limit <= 0 else min(limit, len(rows))
    exact, first_bads = 0, []
    role_mismatch = {}
    for i in range(n):
        toks = [int(t) for t in np.asarray(rows[i]).ravel()]
        while toks and toks[-1] == 0:
            toks.pop()                          # strip pad tail
        if toks and toks[-1] == EOS:
            toks.pop()
        back = performance_encode(performance_decode(toks))
        if back == toks:
            exact += 1
            continue
        k = next((j for j in range(min(len(back), len(toks)))
                  if back[j] != toks[j]), min(len(back), len(toks)))
        ref_t = toks[k] if k < len(toks) else None
        got_t = back[k] if k < len(back) else None
        kind = (f"{token_role(ref_t) if ref_t is not None else 'END'}"
                " -> "
                f"{token_role(got_t) if got_t is not None else 'END'}")
        role_mismatch[kind] = role_mismatch.get(kind, 0) + 1
        if len(first_bads) < 3:
            first_bads.append((i, k, len(toks), len(back),
                               toks[max(0, k - 3): k + 4],
                               back[max(0, k - 3): k + 4]))
    rate = exact / max(n, 1)
    print(f"[4] token-stream re-encode: {exact}/{n} rows exact "
          f"({100 * rate:.2f}%)")
    for i, k, lt, lb, a, b in first_bads:
        print(f"  row {i} diverges at pos {k} (ref len {lt}, ours {lb}):\n"
              f"    ref  ... {fmt(a)} ...\n"
              f"    ours ... {fmt(b)} ...")
    if role_mismatch:
        top = sorted(role_mismatch.items(), key=lambda kv: -kv[1])[:6]
        print("  divergence histogram (ref-role -> our-role at first "
              "divergence): "
              + ", ".join(f"{k} x{v}" for k, v in top))
    ok = rate == 1.0
    print("[4]", "PASS" if ok else "FAIL")
    return ok


def run_sweep(args) -> bool:
    """--params-dir mode (round-4 VERDICT next #5): discover the six
    released checkpoint names under the directory, run converter
    round-trip + torch forward parity (+ Table-1 eval unless --skip-eval)
    per checkpoint, then print ONE summary table. A missing checkpoint or
    any failing section makes the sweep fail."""
    import torch
    rows = []
    for fname, kind in RELEASED_CKPTS:
        path = os.path.join(args.params_dir, fname)
        print(f"\n=== {kind}: {fname} ===")
        if not os.path.exists(path):
            print("MISSING")
            rows.append((kind, fname, None, None, None))
            continue
        # per-checkpoint containment: one unreadable/unconvertible .pt
        # (unknown key, truncated file, ...) marks its row FAIL and the
        # sweep still validates the rest — the whole point of the
        # one-command unattended run over all six released checkpoints
        try:
            sd = torch.load(path, map_location="cpu")
            sd = {k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()}
            rt = check_roundtrip(sd)
            fw = check_forward(sd, kind)
            ev = None
            if not args.skip_eval:
                args.from_pt = path    # run_table1_eval reads it from args
                ev = run_table1_eval(kind, args)
        except Exception as e:
            print(f"ERROR validating {fname}: {type(e).__name__}: {e}")
            rt, fw, ev = False, False, None
        rows.append((kind, fname, rt, fw, ev))

    def cell(v):
        return "-" if v is None else ("PASS" if v else "FAIL")

    ok = True
    print("\nsweep summary:")
    print(f"{'kind':<10} {'checkpoint':<34} {'roundtrip':<10} "
          f"{'forward':<8} table1")
    for kind, fname, rt, fw, ev in rows:
        missing = rt is None and fw is None
        ok = ok and not missing and bool(rt) and bool(fw) and ev is not False
        first = "MISSING" if missing else cell(rt)
        print(f"{kind:<10} {fname:<34} {first:<10} {cell(fw):<8} {cell(ev)}")
    print("sweep:", "ALL PASS" if ok else "FAILURES PRESENT")
    return ok


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--from-pt", default=None,
                    help="released reference .pt checkpoint")
    ap.add_argument("--params-dir", default=None,
                    help="sweep mode: directory holding the six released "
                         ".pt checkpoints; validates each and prints one "
                         "summary table (mutually exclusive with --from-pt)")
    ap.add_argument("--kind", default=None, choices=KINDS)
    ap.add_argument("--data-dir", default=None,
                    help="real corpus cache dir (data/values_v3 schema)")
    ap.add_argument("--tokens", default=None,
                    help="released song_tokens.npy for codec parity")
    ap.add_argument("--token-limit", type=int, default=0,
                    help="check only the first N token rows (0 = all)")
    ap.add_argument("--skip-eval", action="store_true")
    ap.add_argument("--synthetic-size", type=int, default=2048)
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    ap.add_argument("--samples", type=int, default=None)
    ap.add_argument("--eval-epochs", type=int, default=None)
    ap.add_argument("--decode-steps", type=int, default=None)
    args = ap.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from music_fader_nets_tpu.train.cli import enable_compilation_cache
    enable_compilation_cache()
    if args.params_dir and args.from_pt:
        ap.error("--params-dir and --from-pt are mutually exclusive")
    if not args.from_pt and not args.tokens and not args.params_dir:
        ap.error("nothing to do: pass --from-pt, --params-dir and/or "
                 "--tokens")

    results = []
    if args.params_dir:            # NB: run_sweep reuses args.from_pt per
        results.append(run_sweep(args))  # checkpoint — hence the elif
    elif args.from_pt:
        import torch
        kind = args.kind or infer_kind(args.from_pt)
        print(f"checkpoint: {args.from_pt} (kind={kind})")
        sd = torch.load(args.from_pt, map_location="cpu")
        sd = {k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()}
        results.append(check_roundtrip(sd))
        results.append(check_forward(sd, kind))
        if not args.skip_eval:
            results.append(run_table1_eval(kind, args))
    if args.tokens:
        results.append(check_token_stream(args.tokens, args.token_limit))

    print("PARITY:", "ALL PASS" if all(results) else "FAILURES PRESENT")
    return 0 if all(results) else 1


if __name__ == "__main__":
    sys.exit(main())
