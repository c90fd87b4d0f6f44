"""Reference-protocol baselines measured with PyTorch on CPU.

Two suites, both clean-room reimplementations of the reference's loops:

``--suite flagship`` (default) — the two hot loops (SURVEY.md §3.1) for the
BASELINE.md flagship config (PreResNet-20 / CIFAR-10, batch 128):

1. sampler hot loop — per-batch forward/CE/backward + the optimSGHMC update
   (optim_sghmc.py:43-67 math: wd/N coupling, momentum buffer, Langevin
   noise), exactly as the reference's epoch loop drives it (sghmc.py:72-87);
2. BMA eval hot loop — sequential per-model per-batch forward with softmax
   accumulation (prediction.py:52-74).

Writes assets/baseline_cpu.json consumed by bench.py's ``vs_baseline``.

``--suite methods`` — the reference's per-method timing protocol
(/root/reference/URSABench/time_script.py:70-125): for each inference
method on MLP200/MNIST, burn-in zeroed per the script's rules, S=3 samples,
T=10 trials, mean +- std seconds. Each method's ``sample()`` work-loop is
mirrored in plain torch (same epoch/leapfrog/collect counts the reference's
implementations run at these hyperparameters; hyperparameters from
assets/tuned_hyperparams.json — the same values the TPU-side
``ursabench_tpu.time_script`` resolves). Writes
assets/method_times_mlp200_cpu.json and, when the TPU-side warm artifact is
present, assets/method_times_vs_cpu.json with per-method speedup columns —
the measured "matching-or-beating per method" table.

Usage: python benchmarks/torch_cpu_baseline.py [--suite methods] [--T 10]
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


# ---------------------------------------------------------------------------
# --suite methods: the reference per-method timing protocol on MLP200/MNIST
# (time_script.py:70-125). Each sampler's work loop is mirrored in plain
# torch at the SAME epoch/leapfrog/collect counts the reference runs with
# burn-in zeroed; hyperparameters come from assets/tuned_hyperparams.json.
# ---------------------------------------------------------------------------

import copy  # noqa: E402


def _mlp200(dropout=0.0):
    layers = [nn.Flatten(), nn.Linear(784, 200)]
    if dropout:
        layers.append(nn.Dropout(dropout))  # before relu (ref mlp.py:39)
    layers += [nn.ReLU(), nn.Linear(200, 200)]
    if dropout:
        layers.append(nn.Dropout(dropout))
    layers += [nn.ReLU(), nn.Linear(200, 10)]
    return nn.Sequential(*layers)


def _mnist_batches(n=60000, bs=128, seed=0):
    g = torch.Generator().manual_seed(seed)
    x = torch.randn(n, 1, 28, 28, generator=g)
    y = torch.randint(0, 10, (n,), generator=g)
    return [(x[i:i + bs], y[i:i + bs]) for i in range(0, n, bs)], n


def _cosine_lr(lr0, eta_min, t_max, epoch):
    return eta_min + (lr0 - eta_min) * 0.5 * (
        1.0 + math.cos(math.pi * epoch / t_max))


def _sgmcmc_epoch(model, batches, bufs, lr, momentum, wd, n, noise=True):
    model.train()
    for x, y in batches:
        model.zero_grad()
        F.cross_entropy(model(x), y).backward()
        sghmc_step(model, bufs, lr, momentum, wd, n, noise)


def _sgd_epoch(model, opt, batches):
    model.train()
    for x, y in batches:
        opt.zero_grad()
        F.cross_entropy(model(x), y).backward()
        opt.step()


def _flat_params(model):
    return torch.cat([p.detach().reshape(-1) for p in model.parameters()])


def _sample_sghmc(hyp, batches, n, S, alpha_override=None):
    """sghmc.py:66-87 — burn_in+1 epochs on the first draw then 1/draw;
    cosine LR over burn+S epochs; noise always on (vacuous gate, :83)."""
    model = _mlp200()
    alpha = alpha_override if alpha_override is not None else hyp.get("alpha", 0.1)
    momentum = 1.0 - alpha
    wd = 1.0 / hyp["prior_std"] ** 2
    burn = 0  # time_script zeroes burn-in for SGHMC/SGLD
    t_max = max(burn + S, 1)
    bufs = [None] * len(list(model.parameters()))
    draws, epoch = [], 0
    for s in range(S):
        for _ in range(burn + 1 if s == 0 else 1):
            lr = _cosine_lr(hyp["lr"], 0.0, t_max, epoch)
            _sgmcmc_epoch(model, batches, bufs, lr, momentum, wd, n)
            epoch += 1
        draws.append(copy.deepcopy(model.state_dict()))
    return draws


def _sample_csghmc(hyp, batches, n, S, alpha_override=None):
    """csghmc.py:64-111 — per-batch cyclic cosine LR (float num_batch
    quirk), cycle-tail noise, tail harvest; time_script forces 1 cycle of
    S samples with burn 0."""
    model = _mlp200()
    alpha = alpha_override if alpha_override is not None else hyp.get("alpha", 1.0)
    momentum = 1.0 - alpha
    wd = 1.0 / hyp["prior_std"] ** 2
    cycle_length = max(int(hyp["cycle_length"]), S + 2)
    num_batch = max(1.0, n / 128 + 1.0)
    cycle_iters = (cycle_length * 1 * num_batch) // 1
    bufs = [None] * len(list(model.parameters()))
    draws, epoch = [], 0
    while len(draws) < S:
        noise = (epoch % cycle_length) + 1 > (cycle_length - S)
        model.train()
        for i, (x, y) in enumerate(batches):
            rcounter = epoch * num_batch + i
            lr = 0.5 * (math.cos(math.pi * (rcounter % cycle_iters)
                                 / cycle_iters) + 1.0) * hyp["lr_0"]
            model.zero_grad()
            F.cross_entropy(model(x), y).backward()
            sghmc_step(model, bufs, lr, momentum, wd, n, noise)
        epoch += 1
        if (epoch - 1) % cycle_length >= cycle_length - S:
            draws.append(copy.deepcopy(model.state_dict()))
    return draws


def _sample_swag(hyp, batches, n, S):
    """swag.py:60-118 — burn epochs of SGD then num_iterates collect epochs
    (running mean/sq + rank-limited deviation rows), then S diag+low-rank
    draws; time_script forces burn_in_epochs=1."""
    model = _mlp200()
    opt = torch.optim.SGD(model.parameters(), lr=hyp["swag_lr"],
                          momentum=hyp["momentum"],
                          weight_decay=hyp["swag_wd"])
    mean = sq = None
    dev_rows = []
    k_max = 20
    n_coll = 0
    for epoch in range(1 + int(hyp["num_iterates"])):
        _sgd_epoch(model, opt, batches)
        if epoch >= 1:
            w = _flat_params(model)
            if mean is None:
                mean = torch.zeros_like(w)
                sq = torch.zeros_like(w)
            mean = mean * (n_coll / (n_coll + 1.0)) + w / (n_coll + 1.0)
            sq = sq * (n_coll / (n_coll + 1.0)) + w ** 2 / (n_coll + 1.0)
            dev_rows.append(w - mean)
            if len(dev_rows) > k_max:
                dev_rows.pop(0)
            n_coll += 1
    var = torch.clamp(sq - mean ** 2, min=1e-30)
    cms = torch.stack(dev_rows)
    draws = []
    for _ in range(S):
        w = mean + var.sqrt() * torch.randn_like(mean)
        if cms.shape[0] > 1:
            z = torch.randn(cms.shape[0])
            w = w + (cms.T @ z) / ((k_max - 1) ** 0.5)
        draws.append(w.clone())
    return draws


def _sample_sgd(hyp, batches, n, S, dropout=0.0):
    """sgd.py:36,75 / vi_dropout.py:55 — epochs+1 training epochs on the
    first draw (time_script zeroes epochs -> exactly 1), then free draws."""
    model = _mlp200(dropout)
    if dropout and not hyp.get("weight_decay", 0):
        wd = hyp["lengthscale"] ** 2 * (1 - dropout) / (2.0 * n)
    else:
        wd = hyp.get("weight_decay", 0.0)
    opt = torch.optim.SGD(model.parameters(), lr=hyp["lr"],
                          momentum=hyp["momentum"], weight_decay=wd)
    _sgd_epoch(model, opt, batches)
    return [copy.deepcopy(model.state_dict()) for _ in range(S)]


def _sample_hmc(hyp, x_full, y_full, S):
    """inference/hmc.py:71-75 protocol via hamiltorch: S draws of L
    leapfrog steps on the FULL-data posterior (sum-CE + tau/2 ||theta||^2),
    Gaussian momentum with diagonal mass, MH accept; burn=-1 keeps all."""
    model = _mlp200()
    tau, mass, eps, L = hyp["tau"], hyp["mass"], hyp["step_size"], int(hyp["L"])

    def grad_and_energy():
        model.zero_grad()
        nll = F.cross_entropy(model(x_full), y_full, reduction="sum")
        prior = 0.5 * tau * sum((p * p).sum() for p in model.parameters())
        (nll + prior).backward()
        return float(nll) + float(prior)

    draws = []
    for _ in range(S):
        p0 = [torch.randn_like(p) * math.sqrt(mass) for p in model.parameters()]
        e0 = grad_and_energy() + sum(float((m * m).sum()) for m in p0) / (2 * mass)
        mom = [m - 0.5 * eps * p.grad for m, p in zip(p0, model.parameters())]
        with torch.no_grad():
            for p, m in zip(model.parameters(), mom):
                p.add_(eps * m / mass)
        for step in range(L):
            e_last = grad_and_energy()
            half = 0.5 if step == L - 1 else 1.0
            for m, p in zip(mom, model.parameters()):
                m.sub_(half * eps * p.grad)
            if step < L - 1:
                with torch.no_grad():
                    for p, m in zip(model.parameters(), mom):
                        p.add_(eps * m / mass)
        e1 = e_last + sum(float((m * m).sum()) for m in mom) / (2 * mass)
        if not (math.log(max(torch.rand(()).item(), 1e-30)) < e0 - e1):
            pass  # rejected draws keep the position (timing-equivalent)
        draws.append(copy.deepcopy(model.state_dict()))
    return draws


def _sample_pca_ess(hyp, batches, x_full, y_full, n, S):
    """pca_subspace protocol (subspace_inference ESS): 1 SWA burn epoch +
    num_swag_iterates collect epochs (time_script caps at 5), rank-K PCA of
    the deviation rows (K x K Gram eigh), then S elliptical-slice-sampling
    transitions whose proposals each cost one FULL-data likelihood eval."""
    model = _mlp200()
    opt = torch.optim.SGD(model.parameters(), lr=hyp["swag_lr"],
                          momentum=hyp["swag_momentum"],
                          weight_decay=hyp["swag_wd"])
    iters = max(2, min(int(hyp["num_swag_iterates"]), 5))
    mean = None
    rows, n_coll = [], 0
    for epoch in range(1 + iters):
        _sgd_epoch(model, opt, batches)
        if epoch >= 1:
            w = _flat_params(model)
            mean = (w if mean is None
                    else mean * (n_coll / (n_coll + 1.0)) + w / (n_coll + 1.0))
            rows.append(w - mean)
            n_coll += 1
    A = torch.stack(rows)
    gram = A @ A.T
    evals, evecs = torch.linalg.eigh(gram)
    k = min(int(hyp["rank"]), A.shape[0])
    P = (evecs[:, -k:].T @ A)  # (k, D) subspace basis
    shapes = [p.shape for p in model.parameters()]
    sizes = [p.numel() for p in model.parameters()]

    def log_lik(z):
        w = mean + P.T @ z
        with torch.no_grad():
            off = 0
            for p, sh, sz in zip(model.parameters(), shapes, sizes):
                p.copy_(w[off:off + sz].reshape(sh))
                off += sz
            nll = F.cross_entropy(model(x_full), y_full, reduction="sum")
        return -float(nll) / hyp["temperature"]

    z = torch.zeros(k)
    ll = log_lik(z)
    draws = []
    for _ in range(S):
        nu = torch.randn(k) * hyp["prior_std"]
        log_y = ll + math.log(max(torch.rand(()).item(), 1e-30))
        theta = torch.rand(()).item() * 2 * math.pi
        lo, hi = theta - 2 * math.pi, theta
        while True:
            zp = z * math.cos(theta) + nu * math.sin(theta)
            ll = log_lik(zp)
            if ll > log_y:
                z = zp
                break
            if theta < 0:
                lo = theta
            else:
                hi = theta
            theta = lo + (hi - lo) * torch.rand(()).item()
        draws.append(z.clone())
    return draws


def methods_suite(args):
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "..", "assets",
                           "tuned_hyperparams.json")) as f:
        lib = json.load(f)["MLP200MNIST"]
    S, T = args.S, args.T
    batches, n = _mnist_batches()
    x_full = torch.cat([b[0] for b in batches])
    y_full = torch.cat([b[1] for b in batches])

    runners = {
        "HMC": lambda: _sample_hmc(lib["HMC"], x_full, y_full, S),
        "SGLD": lambda: _sample_sghmc(lib["SGLD"], batches, n, S,
                                      alpha_override=1.0),
        "SGHMC": lambda: _sample_sghmc(lib["SGHMC"], batches, n, S),
        "cSGLD": lambda: _sample_csghmc(lib["cSGLD"], batches, n, S,
                                        alpha_override=1.0),
        "cSGHMC": lambda: _sample_csghmc(lib["cSGHMC"], batches, n, S),
        # SWAG has no MLP200MNIST tuned entry; both sides fall back to the
        # class defaults (num_iterates=50, momentum=0.1, lr 1e-3, wd 1e-3)
        # with time_script's burn_in_epochs=1 override
        "SWAG": lambda: _sample_swag(
            {"swag_lr": 0.001, "swag_wd": 0.001, "momentum": 0.1,
             "num_iterates": 50}, batches, n, S),
        "MCdropout": lambda: _sample_sgd(
            lib["MCdropout"], batches, n, S,
            dropout=lib["MCdropout"]["dropout"]),
        "SGD": lambda: _sample_sgd(lib["SGD"], batches, n, S),
        "PCASubspaceSampler": lambda: _sample_pca_ess(
            lib["PCASubspaceSampler"], batches, x_full, y_full, n, S),
    }
    # expensive methods (full-batch HMC, 51-epoch SWAG, 21-22-epoch
    # cyclic samplers, ESS) get fewer trials on one CPU core; the mean is
    # what the speedup column consumes and CPU trials have no compile
    # variance. Recorded per method in the artifact.
    t_by_method = {"HMC": min(T, 3), "SWAG": min(T, 3),
                   "cSGHMC": min(T, 3), "cSGLD": min(T, 3),
                   "PCASubspaceSampler": min(T, 3)}
    out = {}
    for name in (args.methods or list(runners)):
        times = []
        for t in range(t_by_method.get(name, T)):
            torch.manual_seed(1 + t)
            t0 = time.perf_counter()
            runners[name]()
            times.append(time.perf_counter() - t0)
        m = sum(times) / len(times)
        sd = (sum((x - m) ** 2 for x in times) / max(len(times) - 1, 1)) ** 0.5
        out[name + "_mean"] = m
        out[name + "_std"] = sd
        out[name + "_trials"] = len(times)
        print(f"{name}: {m:.3f} +- {sd:.3f} s (T={len(times)})", flush=True)

    meta = {"config": "MLP200/MNIST bs128 n60000, S=3 T=%d" % T,
            "hardware": f"CPU x{os.cpu_count()} (torch {torch.__version__})",
            "protocol": "time_script.py:70-125 burn-in-zeroed"}
    cpu_path = os.path.join(here, "..", "assets",
                            "method_times_mlp200_cpu.json")
    with open(os.path.abspath(cpu_path), "w") as f:
        json.dump({**meta, **out}, f, indent=1)

    tpu_path = os.path.join(here, "..", "assets",
                            "method_times_mlp200_tpu_warm_r4.json")
    if os.path.exists(tpu_path):
        with open(tpu_path) as f:
            tpu = json.load(f)
        rows = []
        for name in runners:
            if name + "_mean" in out and name + "_mean" in tpu:
                c, tm = out[name + "_mean"], tpu[name + "_mean"]
                rows.append({"method": name, "cpu_s": round(c, 3),
                             "tpu_s": round(tm, 3),
                             "tpu_speedup": round(c / tm, 2)})
        comb = {**meta, "note": "tpu_s from the warm-process TPU artifact "
                                "(steady-state sampling; compile excluded "
                                "on both sides — torch has no compile)",
                "rows": rows}
        with open(os.path.abspath(os.path.join(
                here, "..", "assets", "method_times_vs_cpu.json")), "w") as f:
            json.dump(comb, f, indent=1)
        print(json.dumps(rows))
    print(json.dumps(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", choices=["flagship", "methods"],
                    default="flagship")
    ap.add_argument("--S", type=int, default=3)
    ap.add_argument("--T", type=int, default=10)
    ap.add_argument("--methods", type=str, nargs="*", default=None)
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
