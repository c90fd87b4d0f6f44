"""Reference-protocol PER-METHOD timing baseline, PyTorch on CPU.

Clean-room reimplementation of the reference's time_script protocol
(/root/reference/URSABench/time_script.py:70-125): for each inference
method, load its BO-tuned hyperparameters, apply the script's burn-in
normalization (:82-98), time T=10 trials of ``sample()`` drawing S=3
posterior samples on MLP200/MNIST (60k train, batch 128), record
mean +- std seconds. This is the reference half of the per-method
"matching-or-beating" comparison — the TPU half is
``python -m ursabench_tpu.cli time`` (assets/method_times_mlp200_tpu_*.json);
``merge_comparison()`` joins the two into
assets/method_times_comparison.json with per-method vs_cpu ratios.

Methods: SGHMC, SGLD, cSGHMC, cSGLD, SWAG, MCdropout, SGD,
PCASubspaceSampler — every epoch-driven method in the reference's list.
HMC is excluded: the reference's HMC is hamiltorch full-batch leapfrog
with L=40 tuned steps; at 60k x 40 x S full-data grads per trial a
single-core CPU run is hours per trial, so no honest T=10 number fits
this machine (the TPU artifact carries HMC measured against the same
protocol shape).

Per-step math is the reference's optimSGHMC update (optim_sghmc.py:43-67:
wd/N-coupled grad, momentum buffer, sqrt(2(1-alpha)lr)/N Langevin noise)
with the per-epoch cosine LR of sghmc.py; SWAG follows swag.py's
burn -> iterate-collection (running first/second moments + deviation
columns) -> Gaussian draw; PCASubspaceSampler follows
pca_subspace_sampling.py's SWAG-trajectory -> PCA subspace -> elliptical
slice sampling with full-data log-density per contour proposal.

Synthetic data (zero-egress box): uniform pixels/labels — wall time does
not depend on label structure.

Usage: python benchmarks/torch_cpu_methods.py [--T 10] [--methods ...]
"""

import argparse
import json
import math
import os
import time

import numpy as np
import torch
import torch.nn.functional as F

ASSET_DIR = os.path.abspath(os.path.join(os.path.dirname(__file__), "..",
                                         "assets"))
N_TRAIN, BATCH, CLASSES, DIM, HIDDEN = 60000, 128, 10, 784, 200
S = 3


def load_tuned(method):
    with open(os.path.join(ASSET_DIR, "tuned_hyperparams.json")) as f:
        lib = json.load(f)
    return dict(lib["MLP200MNIST"].get(method, {}))


def normalize_burnin(method, hyp):
    """time_script.py:82-98 rules, S=3."""
    if method == "SWAG":
        hyp.setdefault("swag_lr", 0.001)
        hyp.setdefault("lr_init", 0.001)
        hyp.setdefault("momentum", 0.1)
        hyp.setdefault("swag_wd", 0.001)
        hyp.setdefault("num_iterates", 50)
        hyp["burn_in_epochs"] = 1
    if method in ("SGHMC", "SGLD"):
        hyp["burn_in_epochs"] = 0
    if method in ("cSGHMC", "cSGLD"):
        hyp["burn_in_epochs"] = 0
        hyp["num_cycles"] = 1
        hyp["num_samples_per_cycle"] = S
        hyp["cycle_length"] = max(int(hyp.get("cycle_length", S + 2)), S + 2)
    if method in ("MCdropout", "SGD"):
        hyp["epochs"] = 0
    if method == "PCASubspaceSampler":
        hyp["swag_burn_in_epochs"] = 1
        hyp["num_swag_iterates"] = max(
            2, min(int(hyp.get("num_swag_iterates", 5)), 5))
    hyp["num_samples"] = S
    return hyp


class MLP200(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.fc1 = torch.nn.Linear(DIM, HIDDEN)
        self.fc2 = torch.nn.Linear(HIDDEN, HIDDEN)
        self.fc3 = torch.nn.Linear(HIDDEN, CLASSES)

    def forward(self, x):
        x = F.relu(self.fc1(x.reshape(-1, DIM)))
        x = F.relu(self.fc2(x))
        return self.fc3(x)


def make_data(seed=0):
    g = torch.Generator().manual_seed(seed)
    x = torch.rand(N_TRAIN, DIM, generator=g)
    y = torch.randint(0, CLASSES, (N_TRAIN,), generator=g)
    return x, y


def epoch_batches(x, y, epoch_seed):
    order = torch.randperm(N_TRAIN,
                           generator=torch.Generator().manual_seed(epoch_seed))
    for lo in range(0, N_TRAIN, BATCH):
        idx = order[lo:lo + BATCH]
        yield x[idx], y[idx]


def sgmcmc_step(model, bufs, grads_ready, lr, alpha, prior_std, noise):
    """optimSGHMC update (reference optim_sghmc.py:43-67 math): grad +
    (wd/N) * param, momentum buffer 1-alpha, Langevin noise
    sqrt(2*alpha*lr)/N when on."""
    wd = 1.0 / (prior_std ** 2)
    with torch.no_grad():
        for i, p in enumerate(model.parameters()):
            if p.grad is None:
                continue
            d = p.grad + (wd / N_TRAIN) * p
            buf = (1 - alpha) * bufs[i] - lr * d if bufs[i] is not None \
                else -lr * d
            if noise:
                buf = buf + torch.randn_like(d) * math.sqrt(
                    2 * alpha * lr) / N_TRAIN
            p.add_(buf)
            bufs[i] = buf


def run_epoch_sgmcmc(model, bufs, x, y, lr, alpha, prior_std, seed,
                     noise=True):
    for bx, by in epoch_batches(x, y, seed):
        model.zero_grad(set_to_none=False)
        F.cross_entropy(model(bx), by).backward()
        sgmcmc_step(model, bufs, True, lr, alpha, prior_std, noise)


def snapshot(model):
    return [p.detach().clone() for p in model.parameters()]


def sample_sghmc(hyp, x, y, sgld=False):
    model = MLP200()
    bufs = [None] * len(list(model.parameters()))
    lr0, prior = hyp["lr"], hyp["prior_std"]
    alpha = 1.0 if sgld else hyp["alpha"]
    draws, ep = [], 0
    t_max = max(1, hyp["burn_in_epochs"] + hyp["num_samples"])
    for s in range(hyp["num_samples"]):
        n_ep = hyp["burn_in_epochs"] + 1 if s == 0 else 1
        for _ in range(n_ep):
            lr = 0.5 * lr0 * (1 + math.cos(math.pi * min(ep, t_max) / t_max))
            run_epoch_sgmcmc(model, bufs, x, y, lr, alpha, prior, 1000 + ep)
            ep += 1
        draws.append(snapshot(model))
    return draws


def sample_csghmc(hyp, x, y, sgld=False):
    model = MLP200()
    bufs = [None] * len(list(model.parameters()))
    lr0, prior = hyp["lr_0"], hyp["prior_std"]
    alpha = 1.0 if sgld else hyp["alpha"]
    cyc, per, ncyc = hyp["cycle_length"], hyp["num_samples_per_cycle"], \
        hyp["num_cycles"]
    draws = []
    for ep in range(cyc * ncyc):
        pos = ep % cyc
        lr = 0.5 * lr0 * (math.cos(math.pi * pos / cyc) + 1)
        tail = pos >= cyc - per
        run_epoch_sgmcmc(model, bufs, x, y, lr, alpha, prior, 2000 + ep,
                         noise=tail)
        if tail:
            draws.append(snapshot(model))
    return draws


def sgd_epoch(model, opt, sched, x, y, seed):
    for bx, by in epoch_batches(x, y, seed):
        opt.zero_grad()
        F.cross_entropy(model(bx), by).backward()
        opt.step()
    if sched is not None:
        sched.step()


def collect_swag_trajectory(model, x, y, lr, momentum, wd, burn, iterates,
                            seed0):
    """swag.py behavior: burn SGD epochs, then one collection per epoch of
    running mean / squared mean + a deviation column."""
    opt = torch.optim.SGD(model.parameters(), lr=lr, momentum=momentum,
                          weight_decay=wd)
    for e in range(burn):
        sgd_epoch(model, opt, None, x, y, seed0 + e)
    theta = torch.nn.utils.parameters_to_vector(model.parameters()).detach()
    mean, sq_mean, cols = theta.clone(), theta ** 2, []
    for k in range(1, iterates):
        sgd_epoch(model, opt, None, x, y, seed0 + burn + k)
        theta = torch.nn.utils.parameters_to_vector(
            model.parameters()).detach()
        mean = (mean * k + theta) / (k + 1)
        sq_mean = (sq_mean * k + theta ** 2) / (k + 1)
        cols.append(theta - mean)
    return model, mean, sq_mean, torch.stack(cols) if cols else None


def sample_swag(hyp, x, y):
    model = MLP200()
    model, mean, sq_mean, dev = collect_swag_trajectory(
        model, x, y, hyp["swag_lr"], hyp["momentum"], hyp["swag_wd"],
        hyp["burn_in_epochs"], hyp["num_iterates"], 3000)
    var = torch.clamp(sq_mean - mean ** 2, min=1e-30)
    draws = []
    K = dev.shape[0] if dev is not None else 0
    for _ in range(hyp["num_samples"]):
        z1 = torch.randn_like(mean)
        theta = mean + var.sqrt() * z1 / math.sqrt(2.0)
        if K > 1:
            z2 = torch.randn(K)
            theta = theta + (dev.T @ z2) / math.sqrt(2.0 * (K - 1))
        draws.append(theta)
    return draws


def full_data_log_density(model, shape_params, theta, x, y, prior_std,
                          temperature):
    torch.nn.utils.vector_to_parameters(theta, model.parameters())
    total = 0.0
    with torch.no_grad():
        for lo in range(0, N_TRAIN, BATCH):
            logits = model(x[lo:lo + BATCH])
            total += F.cross_entropy(logits, y[lo:lo + BATCH],
                                     reduction="sum").item()
    prior = float((theta ** 2).sum()) / (2 * prior_std ** 2)
    return -(total / temperature + prior)


def sample_pca_subspace(hyp, x, y):
    """pca_subspace_sampling.py: SWAG trajectory -> PCA of deviations ->
    elliptical slice sampling in the subspace, full-data density per
    contour proposal."""
    model = MLP200()
    model, mean, _, dev = collect_swag_trajectory(
        model, x, y, hyp["swag_lr"], hyp["swag_momentum"], hyp["swag_wd"],
        hyp["swag_burn_in_epochs"], hyp["num_swag_iterates"], 4000)
    # PCA via SVD of the (K, D) deviation matrix, rank-capped
    K = dev.shape[0]
    rank = min(int(hyp["rank"]), K)
    U, Sv, Vt = torch.linalg.svd(dev, full_matrices=False)
    P = (Vt[:rank] * Sv[:rank, None]) / math.sqrt(max(K - 1, 1))  # (r, D)
    prior_std, temp = hyp["prior_std"], hyp["temperature"]

    def logd(zvec):
        theta = mean + P.T @ zvec
        return full_data_log_density(model, None, theta, x, y, prior_std,
                                     temp)

    z = torch.zeros(rank)
    cur = logd(z)
    draws = []
    g = torch.Generator().manual_seed(5)
    for _ in range(hyp["num_samples"]):
        nu = torch.randn(rank, generator=g) * prior_std
        logy = cur + math.log(float(torch.rand(1, generator=g)))
        angle = float(torch.rand(1, generator=g)) * 2 * math.pi
        lo, hi = angle - 2 * math.pi, angle
        while True:
            cand = z * math.cos(angle) + nu * math.sin(angle)
            cand_ld = logd(cand)
            if cand_ld > logy:
                z, cur = cand, cand_ld
                break
            if angle < 0:
                lo = angle
            else:
                hi = angle
            angle = lo + float(torch.rand(1, generator=g)) * (hi - lo)
        draws.append(mean + P.T @ z)
    return draws


def sample_sgd(hyp, x, y, dropout=False):
    """SGD/MCdropout with epochs=0 (the protocol's zeroed burn-in): the
    reference constructs schedulers and returns the model num_samples
    times — sample() is pure overhead, timed as such."""
    model = MLP200()
    opt = torch.optim.SGD(model.parameters(), lr=hyp["lr"],
                          momentum=hyp["momentum"],
                          weight_decay=hyp.get("weight_decay", 0.0))
    for e in range(int(hyp["epochs"])):
        sgd_epoch(model, opt, None, x, y, 6000 + e)
    reps = hyp["num_samples"] if dropout else 1
    return [snapshot(model) for _ in range(reps)]


SAMPLERS = {
    "SGHMC": lambda h, x, y: sample_sghmc(h, x, y),
    "SGLD": lambda h, x, y: sample_sghmc(h, x, y, sgld=True),
    "cSGHMC": lambda h, x, y: sample_csghmc(h, x, y),
    "cSGLD": lambda h, x, y: sample_csghmc(h, x, y, sgld=True),
    "SWAG": lambda h, x, y: sample_swag(h, x, y),
    "MCdropout": lambda h, x, y: sample_sgd(h, x, y, dropout=True),
    "SGD": lambda h, x, y: sample_sgd(h, x, y),
    "PCASubspaceSampler": lambda h, x, y: sample_pca_subspace(h, x, y),
}


def merge_comparison(cpu_path, out_path):
    """Join the CPU and TPU method-times artifacts into one table with
    per-method vs_cpu speedups."""
    tpu_path = None
    for cand in ("method_times_mlp200_tpu_warm_r5.json",
                 "method_times_mlp200_tpu_warm_r4.json",
                 "method_times_mlp200_tpu.json"):
        p = os.path.join(ASSET_DIR, cand)
        if os.path.exists(p):
            tpu_path = p
            break
    with open(cpu_path) as f:
        cpu = json.load(f)
    tpu = {}
    if tpu_path:
        with open(tpu_path) as f:
            tpu = json.load(f)
    rows = {}
    for m in SAMPLERS:
        row = {}
        if m + "_mean" in cpu:
            row["cpu_mean_s"] = round(cpu[m + "_mean"], 3)
            row["cpu_std_s"] = round(cpu[m + "_std"], 3)
            if m + "_trials" in cpu:
                row["cpu_trials"] = cpu[m + "_trials"]
        if m + "_mean" in tpu:
            row["tpu_mean_s"] = round(tpu[m + "_mean"], 3)
            row["tpu_std_s"] = round(tpu[m + "_std"], 3)
        if "cpu_mean_s" in row and "tpu_mean_s" in row and row["tpu_mean_s"]:
            row["vs_cpu"] = round(row["cpu_mean_s"] / row["tpu_mean_s"], 2)
        rows[m] = row
    if "HMC_mean" in tpu:
        rows["HMC"] = {"tpu_mean_s": round(tpu["HMC_mean"], 3),
                       "tpu_std_s": round(tpu["HMC_std"], 3),
                       "cpu_mean_s": None,
                       "note": "reference HMC (hamiltorch, L=40 full-batch "
                               "leapfrog) needs hours/trial on this 1-core "
                               "CPU; no honest T=10 number fits"}
    out = {"protocol": f"time_script S={S} T=10, burn-in zeroed, "
                       "MLP200/MNIST-60k bs128",
           "cpu": f"torch {torch.__version__} x{os.cpu_count()} core(s)",
           "tpu_artifact": os.path.basename(tpu_path) if tpu_path else None,
           "methods": rows}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


# Methods whose per-trial cost is a 21-51-epoch deterministic collection
# sweep (cycle/iterate schedules survive the burn-in zeroing); their trial
# variance is scheduler noise only, so fewer trials lose nothing while a
# full T=10 costs ~40 min on this 1-core box.
HEAVY = {"cSGHMC", "cSGLD", "SWAG"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--T", type=int, default=10)
    ap.add_argument("--heavy_T", type=int, default=None,
                    help="trial count for the HEAVY methods (default --T)")
    ap.add_argument("--methods", nargs="*", default=list(SAMPLERS))
    args = ap.parse_args()
    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 1)
    x, y = make_data()
    timer = {}
    for method in args.methods:
        hyp = normalize_burnin(method, load_tuned(method))
        fn = SAMPLERS[method]
        T = args.heavy_T if (method in HEAVY and args.heavy_T) else args.T
        times = np.zeros(T)
        print(method, flush=True)
        for t in range(T):
            t0 = time.perf_counter()
            draws = fn(hyp, x, y)
            times[t] = time.perf_counter() - t0
            assert len(draws) >= 1
            print(f"  trial {t}: {times[t]:.2f}s", flush=True)
        timer[method + "_mean"] = float(times.mean())
        timer[method + "_std"] = float(times.std(ddof=1)) if T > 1 else 0.0
        timer[method + "_trials"] = T
    cpu_path = os.path.join(ASSET_DIR, "method_times_mlp200_cpu.json")
    with open(cpu_path, "w") as f:
        json.dump(timer, f)
    merge_comparison(cpu_path,
                     os.path.join(ASSET_DIR, "method_times_comparison.json"))


if __name__ == "__main__":
    main()
