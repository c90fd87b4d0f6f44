"""Reference-protocol baseline measured with PyTorch on CPU.

Clean-room reimplementation of the reference's two hot loops (SURVEY.md §3.1)
for the BASELINE.md flagship config (PreResNet-20 / CIFAR-10, batch 128):

1. sampler hot loop — per-batch forward/CE/backward + the optimSGHMC update
   (optim_sghmc.py:43-67 math: wd/N coupling, momentum buffer, Langevin
   noise), exactly as the reference's epoch loop drives it (sghmc.py:72-87);
2. BMA eval hot loop — sequential per-model per-batch forward with softmax
   accumulation (prediction.py:52-74).

Writes assets/baseline_cpu.json consumed by bench.py's ``vs_baseline``.
Usage: python benchmarks/torch_cpu_baseline.py [--steps 10] [--members 5]
"""

import argparse
import json
import math
import os
import time

import torch
import torch.nn as nn
import torch.nn.functional as F


class PreBasic(nn.Module):
    def __init__(self, cin, planes, stride=1, downsample=False):
        super().__init__()
        self.bn1 = nn.BatchNorm2d(cin)
        self.conv1 = nn.Conv2d(cin, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.down = (
            nn.Conv2d(cin, planes, 1, stride, bias=False) if downsample else None
        )

    def forward(self, x):
        out = F.relu(self.bn1(x))
        residual = self.down(x) if self.down is not None else x
        out = self.conv1(out)
        out = self.conv2(F.relu(self.bn2(out)))
        return out + residual


class PreResNet20(nn.Module):
    def __init__(self, num_classes=10):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 16, 3, 1, 1, bias=False)
        layers = []
        cin = 16
        for planes, stride in ((16, 1), (32, 2), (64, 2)):
            for i in range(3):
                s = stride if i == 0 else 1
                layers.append(PreBasic(cin, planes, s, downsample=(i == 0 and (s != 1 or cin != planes))))
                cin = planes
        self.layers = nn.Sequential(*layers)
        self.bn = nn.BatchNorm2d(64)
        self.fc = nn.Linear(64, num_classes)

    def forward(self, x):
        x = self.layers(self.conv1(x))
        x = F.relu(self.bn(x))
        x = F.avg_pool2d(x, 8).flatten(1)
        return self.fc(x)


def sghmc_step(model, bufs, lr, momentum, wd, n_train, noise=True):
    with torch.no_grad():
        for i, p in enumerate(model.parameters()):
            if p.grad is None:
                continue
            d = p.grad + (wd / n_train) * p
            if bufs[i] is None:
                buf = momentum * d - lr * d
            else:
                buf = momentum * bufs[i] - lr * d
            if noise:
                buf = buf + torch.randn_like(d) * math.sqrt(
                    2 * (1 - momentum) * lr
                ) / n_train
            p.add_(buf)
            bufs[i] = buf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--members", type=int, default=5)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--eval-batches", type=int, default=8)
    args = ap.parse_args()

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 1)
    model = PreResNet20().train()
    bufs = [None] * len(list(model.parameters()))
    x = torch.randn(args.batch, 3, 32, 32)
    y = torch.randint(0, 10, (args.batch,))

    for _ in range(args.warmup):
        model.zero_grad()
        F.cross_entropy(model(x), y).backward()
        sghmc_step(model, bufs, 0.01, 0.9, 1.0, 50000)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        model.zero_grad()
        F.cross_entropy(model(x), y).backward()
        sghmc_step(model, bufs, 0.01, 0.9, 1.0, 50000)
    t1 = time.perf_counter()
    steps_per_sec = args.steps / (t1 - t0)

    # BMA eval loop: sequential per-member forward, softmax accumulation
    members = [PreResNet20().eval() for _ in range(args.members)]
    xe = torch.randn(args.batch, 3, 32, 32)
    with torch.no_grad():
        for m in members:
            m(xe)  # warmup
        t0 = time.perf_counter()
        for _ in range(args.eval_batches):
            acc = torch.zeros(args.batch, 10)
            for m in members:
                acc += F.log_softmax(m(xe), dim=-1).exp()
        t1 = time.perf_counter()
    images_per_sec = args.eval_batches * args.batch / (t1 - t0)

    out = {
        "config": "PreResNet-20/CIFAR-10 bs128",
        "hardware": f"CPU x{os.cpu_count()} (torch {torch.__version__})",
        "sghmc_steps_per_sec": steps_per_sec,
        "bma_images_per_sec": images_per_sec,
        "ensemble_members": args.members,
    }
    path = os.path.join(os.path.dirname(__file__), "..", "assets", "baseline_cpu.json")
    with open(os.path.abspath(path), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
