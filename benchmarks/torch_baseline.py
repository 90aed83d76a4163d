"""PyTorch baseline for the benchmark denominator.

The reference repo publishes no numbers (BASELINE.md), so the denominator
must be measured. The reference itself is CUDA-only (unconditional
`.cuda()` calls, reference model_v2.py:119) and cannot run in this
environment, so this is an independent, minimal PyTorch implementation of
the same GM-VAE training step — identical architecture shapes and identical
work per step (2 bi-GRU encoders, 2 teacher-forced sub-decoder GRUs, the
per-token 2xGRUCell decode loop, ELBO + mixture posterior + Pati loss,
clipped Adam) — measured on the hardware available to torch here (CPU).

This measures eager PyTorch exactly as the reference runs it: a Python
per-token loop for the decoder (the reference's hot loop, SURVEY.md §3.1).
"""
from __future__ import annotations

import time

import numpy as np
import torch
import torch.nn.functional as F
from torch import nn


class GMVAEBaseline(nn.Module):
    def __init__(self, vocab=342, rhythm=3, note=16, chroma=24,
                 hidden=512, z=128, k=2):
        super().__init__()
        self.vocab, self.z = vocab, z
        self.enc_r = nn.GRU(vocab, hidden, batch_first=True, bidirectional=True)
        self.enc_n = nn.GRU(vocab, hidden, batch_first=True, bidirectional=True)
        self.head_mu_r = nn.Linear(2 * hidden, z)
        self.head_ls_r = nn.Linear(2 * hidden, z)
        self.head_mu_n = nn.Linear(2 * hidden, z)
        self.head_ls_n = nn.Linear(2 * hidden, z)
        self.dec_r = nn.GRU(z + rhythm, hidden, batch_first=True)
        self.dec_n = nn.GRU(z + note, hidden, batch_first=True)
        self.dec_r_h0 = nn.Linear(z, hidden)
        self.dec_n_h0 = nn.Linear(z, hidden)
        self.dec_r_out = nn.Linear(hidden, rhythm)
        self.dec_n_out = nn.Linear(hidden, note)
        zt = 2 * z + chroma
        self.g_h0 = nn.Linear(zt, hidden)
        self.g_cell1 = nn.GRUCell(zt + vocab, hidden)
        self.g_cell2 = nn.GRUCell(hidden, hidden)
        self.g_out = nn.Linear(hidden, vocab)
        self.mix_mu_r = nn.Parameter(torch.randn(k, z) * 0.1)
        self.mix_mu_n = nn.Parameter(torch.randn(k, z) * 0.1)
        self.register_buffer("mix_logvar", torch.full((k, z), -4.0))

    def forward(self, x_oh, r_oh, n_oh, chroma):
        B, T, V = x_oh.shape
        h_r = self.enc_r(x_oh)[1].transpose(0, 1).reshape(B, -1)
        h_n = self.enc_n(x_oh)[1].transpose(0, 1).reshape(B, -1)
        mu_r, std_r = self.head_mu_r(h_r), self.head_ls_r(h_r).exp()
        mu_n, std_n = self.head_mu_n(h_n), self.head_ls_n(h_n).exp()
        z_r = mu_r + std_r * torch.randn_like(std_r)
        z_n = mu_n + std_n * torch.randn_like(std_n)

        def subdec(gru, h0f, outf, track, zz):
            zrep = zz.unsqueeze(1).expand(-1, track.shape[1], -1)
            o = gru(torch.cat([track, zrep], -1), h0f(zz).unsqueeze(0))[0]
            return F.log_softmax(outf(o), 1)

        r_out = subdec(self.dec_r, self.dec_r_h0, self.dec_r_out, r_oh, z_r)
        n_out = subdec(self.dec_n, self.dec_n_h0, self.dec_n_out, n_oh, z_n)

        def posterior(zz, mus):
            d2 = (zz.unsqueeze(1) - mus.unsqueeze(0)) ** 2
            llh = (-0.5 * (d2 / self.mix_logvar.exp().unsqueeze(0)
                           + self.mix_logvar.unsqueeze(0)
                           + np.log(2 * np.pi))).sum(-1)
            return llh, F.softmax(llh, -1)

        ll_r, qy_r = posterior(z_r, self.mix_mu_r)
        ll_n, qy_n = posterior(z_n, self.mix_mu_n)

        # the reference's hot loop: per-token eager 2xGRUCell decode
        zt = torch.cat([z_r, z_n, chroma], -1)
        tok = torch.zeros(B, V)
        tok[:, -1] = 1.0
        h1 = self.g_h0(zt)
        h2 = None
        outs = []
        for i in range(T):
            h1 = self.g_cell1(torch.cat([tok, zt], 1), h1)
            h2 = h1 if i == 0 else h2
            h2 = self.g_cell2(h1, h2)
            outs.append(F.log_softmax(self.g_out(h2), 1))
            tok = x_oh[:, i]
        out = torch.stack(outs, 1)
        return out, r_out, n_out, (mu_r, std_r, mu_n, std_n), \
            (z_r, z_n), (ll_r, qy_r, ll_n, qy_n)


def train_step_time(batch_size=128, seq_len=100, attr_len=16, iters=3,
                    warmup=1, threads=None):
    """Median seconds per training step (forward+backward+clip+Adam)."""
    if threads:
        torch.set_num_threads(threads)
    torch.manual_seed(0)
    model = GMVAEBaseline()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    g = np.random.default_rng(0)
    x = torch.from_numpy(g.integers(0, 342, (batch_size, seq_len)))
    r = torch.from_numpy(g.integers(0, 3, (batch_size, attr_len)))
    n = torch.from_numpy(g.integers(0, 16, (batch_size, attr_len)))
    c = torch.rand(batch_size, 24)
    rd = torch.rand(batch_size)
    nd = torch.rand(batch_size)
    x_oh = F.one_hot(x, 342).float()
    r_oh = F.one_hot(r, 3).float()
    n_oh = F.one_hot(n, 16).float()

    def step():
        opt.zero_grad()
        out, r_out, n_out, (mu_r, std_r, mu_n, std_n), (z_r, z_n), \
            (ll_r, qy_r, ll_n, qy_n) = model(x_oh, r_oh, n_oh, c)
        ce = (5 * F.nll_loss(out.reshape(-1, 342), x.reshape(-1))
              + F.nll_loss(r_out.reshape(-1, 3), r.reshape(-1))
              + F.nll_loss(n_out.reshape(-1, 16), n.reshape(-1)))
        kl = ((-std_r.log() + 0.5 * (std_r ** 2 + mu_r ** 2) - 0.5).mean()
              + (-std_n.log() + 0.5 * (std_n ** 2 + mu_n ** 2) - 0.5).mean())
        mix = (qy_r * F.log_softmax(ll_r, -1)).mean() \
            + (qy_n * F.log_softmax(ll_n, -1)).mean()

        def pati(z0, a):
            dz = z0.reshape(-1, 1) - z0
            da = a.reshape(-1, 1) - a
            return ((torch.tanh(dz) - torch.sign(da)) ** 2).mean()

        loss = ce + 0.2 * kl + mix + pati(z_r[:, 0], rd) + pati(z_n[:, 0], nd)
        loss.backward()
        nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()

    for _ in range(warmup):
        step()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        step()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


if __name__ == "__main__":
    t = train_step_time()
    print(f"torch CPU GM-VAE step: {t:.3f}s -> {128 / t:.1f} seq/s")
