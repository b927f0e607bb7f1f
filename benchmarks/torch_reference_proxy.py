"""Reference-proxy throughput measurement (denominator of the 10x target).

The reference repo is unavailable/unrunnable in this environment
(SURVEY.md §0: /root/reference is empty; no network), so per BASELINE.md's
protocol we measure a *proxy*: the same encoder-decoder depth CNN
(matching ann3depth_tpu/models/encdec.py layer-for-layer in capacity)
implemented in torch — the runtime family the reference used — on this
machine's CPU, training step (fwd + scale-invariant loss + bwd + Adam) at
batch 16, 240x320 in / 120x160 out, f32.

Run:  python benchmarks/torch_reference_proxy.py
Result is recorded in BASELINE.md and as the constant in bench.py.
"""

from __future__ import annotations

import json
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

ENC = [32, 64, 128, 256]


class ConvBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False)
        self.norm = nn.GroupNorm(8, cout)

    def forward(self, x):
        return F.relu(self.norm(self.conv(x)))


class EncDec(nn.Module):
    def __init__(self):
        super().__init__()
        self.stem = ConvBlock(3, 32)
        downs, c_prev = [], 32
        for c in ENC:
            downs += [ConvBlock(c_prev, c, 2), ConvBlock(c, c)]
            c_prev = c
        self.downs = nn.ModuleList(downs)
        ups = []
        dec = list(reversed(ENC[:-1]))
        c_prev = ENC[-1]
        for i, c in enumerate(dec):
            skip_c = ENC[-2 - i]
            ups.append(ConvBlock(c_prev + skip_c, c))
            c_prev = c
        self.ups = nn.ModuleList(ups)
        self.head = nn.Conv2d(c_prev, 1, 3, padding=1)

    def forward(self, x):
        x = self.stem(x)
        skips = []
        for i in range(0, len(self.downs), 2):
            x = self.downs[i + 1](self.downs[i](x))
            skips.append(x)
        for i, up in enumerate(self.ups):
            x = F.interpolate(x, scale_factor=2, mode="bilinear")
            x = torch.cat([x, skips[-2 - i]], dim=1)
            x = up(x)
        return self.head(x)


def si_loss(pred_log, target, lam=0.5):
    d = pred_log.squeeze(1) - torch.log(target.clamp(min=1e-6))
    n = d[0].numel()
    return (d.pow(2).sum(dim=(1, 2)) / n
            - lam * d.sum(dim=(1, 2)).pow(2) / n**2).mean()


def main(batch=16, warmup=5, steps=50):
    torch.manual_seed(0)
    model = EncDec()
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    rng = np.random.default_rng(0)
    imgs = torch.from_numpy(
        rng.normal(0, 1, (batch, 3, 240, 320)).astype(np.float32))
    target = torch.from_numpy(
        rng.uniform(1, 60, (batch, 120, 160)).astype(np.float32))

    def step():
        opt.zero_grad()
        loss = si_loss(model(imgs), target)
        loss.backward()
        opt.step()
        return float(loss.detach())

    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = time.perf_counter() - t0
    ips = batch * steps / dt
    print(json.dumps({
        "metric": "reference_proxy_train_images_per_sec",
        "value": round(ips, 2),
        "unit": "images/sec",
        "hardware": "cpu (torch %s)" % torch.__version__,
    }))
    return ips


if __name__ == "__main__":
    main()
