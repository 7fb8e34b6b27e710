"""A/B harness: the mel-diffusion eps head's bootstrap is **learning-rate
bounded**, identically in jax and torch.

Trains the SAME DiffWave-style denoiser (20 gated residual blocks, 256
channels, zero-init eps head — reference ``modules/diff/net.py:81-130``)
on the SAME shallow-diffusion objective (``shallow_diffusion_tts.py:
206-224``) with the same optimizer, once in this framework (jax) and once
in plain torch.

Round-2 finding (supersedes the round-1 reading of this tool's output):
at Adam lr ~3e-3 — this tool's old default, and what a warmup-scaled Noam
schedule reaches mid-curriculum — the head's gated units saturate in BOTH
frameworks and L1 pins at the predict-zero baseline E|eps|=sqrt(2/pi)
~= 0.798 *permanently* (66k flat steps observed in a real run, with
dilated-conv activations grown ~100x).  At lr <= ~5e-4 the same net
learns promptly (diff 0.798 -> 0.20 within ~3k steps in the real
trainer).  The reference never exposes this head to a hot lr: it stays
frozen until diff_start=100k (tasks/StyleSinger/stylesinger.py:60-61),
where the rsqrt schedule has decayed to ~4e-4.  Scaled-down curricula
must therefore scale ``diff_start`` so that lr(diff_start) <~ 5e-4 (or
keep the reference's absolute ``warmup_updates: 8000``), not by the raw
step fraction alone.

Usage:
  python tools/ab_diffusion_bootstrap.py --impl jax   [--steps 2000]
  python tools/ab_diffusion_bootstrap.py --impl torch [--steps 2000]
  # lr sweep: --lr 4e-4 (learns) vs --lr 3e-3 (permanent flatline)

Prints "<impl> <step> <loss>" every 100 steps.
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_jax(steps: int, batch: int, frames: int, lr: float):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
    import jax.numpy as jnp
    import optax

    from stylesinger_tpu.models import diffusion as diff
    from stylesinger_tpu.models.diffnet import DiffNet

    sched = diff.make_schedule(100, 0.06)
    net = DiffNet(in_dims=80, residual_layers=20, residual_channels=256)
    key = jax.random.PRNGKey(0)
    base = jax.random.normal(key, (batch, frames // 8, 80))
    x0 = jnp.tanh(jax.image.resize(base, (batch, frames, 80), "linear"))
    cond = jnp.tile(x0, (1, 1, 4))[:, :, :256] * 0.5
    params = net.init(jax.random.PRNGKey(1), x0,
                      jnp.zeros((batch,), jnp.int32), cond)["params"]
    tx = optax.adamw(lr)
    opt = tx.init(params)

    def loss_fn(p, rng):
        return diff.shallow_p_losses(
            lambda xt, t: net.apply({"params": p}, xt, t, cond),
            sched, x0, cond, rng, 100)

    @jax.jit
    def step(p, o, rng):
        l, g = jax.value_and_grad(loss_fn)(p, rng)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    for i in range(steps + 1):
        params, opt, l = step(params, opt, jax.random.fold_in(key, i))
        if i % 100 == 0:
            print("jax", i, round(float(l), 4), flush=True)


def run_torch(steps: int, batch: int, frames: int, lr: float):
    import torch
    import torch.nn as nn
    torch.manual_seed(0)

    def Conv1d(*a, **k):
        layer = nn.Conv1d(*a, **k)
        nn.init.kaiming_normal_(layer.weight)
        return layer

    class StepEmb(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.c = c
            self.fc1 = nn.Linear(c, c * 4)
            self.fc2 = nn.Linear(c * 4, c)

        def forward(self, t):
            half = self.c // 2
            freqs = torch.exp(-math.log(10000) *
                              torch.arange(half) / (half - 1))
            args = t.float()[:, None] * freqs[None]
            e = torch.cat([torch.sin(args), torch.cos(args)], -1)
            e = self.fc1(e)
            e = e * torch.tanh(nn.functional.softplus(e))
            return self.fc2(e)

    class Block(nn.Module):
        def __init__(self, c, d):
            super().__init__()
            self.dil = Conv1d(c, 2 * c, 3, padding=d, dilation=d)
            self.diff = nn.Linear(c, c)
            self.condp = Conv1d(c, 2 * c, 1)
            self.outp = Conv1d(c, 2 * c, 1)

        def forward(self, x, cond, step):
            y = x + self.diff(step)[:, :, None]
            y = self.dil(y) + self.condp(cond)
            g, f = y.chunk(2, 1)
            y = torch.sigmoid(g) * torch.tanh(f)
            y = self.outp(y)
            r, s = y.chunk(2, 1)
            return (x + r) / math.sqrt(2.0), s

    class Net(nn.Module):
        def __init__(self, c=256, n_layers=20):
            super().__init__()
            self.inp = Conv1d(80, c, 1)
            self.emb = StepEmb(c)
            self.blocks = nn.ModuleList(
                [Block(c, 2 ** (i % 4)) for i in range(n_layers)])
            self.skipp = Conv1d(c, c, 1)
            self.outp = Conv1d(c, 80, 1)
            nn.init.zeros_(self.outp.weight)
            nn.init.zeros_(self.outp.bias)

        def forward(self, x, t, cond):
            x = torch.relu(self.inp(x))
            e = self.emb(t)
            skips = []
            for b in self.blocks:
                x, s = b(x, cond, e)
                skips.append(s)
            x = torch.stack(skips).sum(0) / math.sqrt(len(self.blocks))
            x = torch.relu(self.skipp(x))
            return self.outp(x)

    betas = torch.linspace(1e-4, 0.06, 100)
    ac = torch.cumprod(1 - betas, 0)
    base = torch.randn(batch, 80, frames // 8)
    x0 = torch.tanh(nn.functional.interpolate(base, size=frames,
                                              mode="linear"))
    cond = torch.cat([x0] * 4, 1)[:, :256] * 0.5
    net = Net()
    opt = torch.optim.AdamW(net.parameters(), lr=lr)
    for i in range(steps + 1):
        t = torch.randint(0, 100, (batch,))
        noise = torch.randn_like(x0)
        a = ac[t].sqrt()[:, None, None]
        s = (1 - ac[t]).sqrt()[:, None, None]
        x_t = a * x0 + s * noise
        loss = (noise - net(x_t, t, cond)).abs().mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
        if i % 100 == 0:
            print("torch", i, round(float(loss), 4), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", choices=["jax", "torch"], required=True)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--lr", type=float, default=4e-4)
    args = ap.parse_args()
    if args.impl == "jax":
        run_jax(args.steps, args.batch, args.frames, args.lr)
    else:
        run_torch(args.steps, args.batch, args.frames, args.lr)
