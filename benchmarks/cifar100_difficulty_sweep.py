"""Calibrate the CIFAR-100 synthetic difficulty to the WRN-28x10 operating
point (VERDICT r4 item 4).

The r4 profile (separation z=5.5) was calibrated on the nearest-empirical-
mean proxy (~20% error) — but that proxy is a weak classifier: WRN-28x10
trains to 2.4% error on the same data, pinned at the 2% label-noise floor,
because Phi(-5.5) leaves essentially zero Bayes-level class overlap for a
high-capacity model. Real CIFAR-100 is a ~20-30%-error problem for this
architecture, and the framework's own design band
(data/sources.resolve_difficulty) is 5-20%.

This sweep trains config4's exact protocol (WRN-28x10, 2-chain SGHMC,
burn 8 + 2 draws) at candidate separations and records BMA test error +
CIFAR100<->SVHN OOD AUROC, so the production override
(sources._SYNTH_DIFFICULTY['CIFAR100']) can be set where error lands in
the band WITH the OOD task still discriminative (AUROC 0.65-0.9).
Programs take data as jit arguments, so every candidate after the first
costs train time only (no recompiles).

Reference anchor: /root/reference/URSABench/tasks/ood_detection.py:107-130
(the OOD protocol config4 drives).

Usage: PYTHONPATH=/root/.axon_site:. python benchmarks/cifar100_difficulty_sweep.py \
           [--separations 2.0 2.5 3.0 3.5]
"""

import argparse
import json
import os
import time

ASSET = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "assets",
                 "cifar100_difficulty_sweep.json")
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--separations", type=float, nargs="*",
                   default=[2.0, 2.5, 3.0, 3.5])
    p.add_argument("--field_overlaps", type=float, nargs="*", default=[None],
                   help="cross-product rho candidates: lower rho makes OOD "
                        "images less class-readable (higher OOD entropy), "
                        "the counter-knob when lower separation raises "
                        "in-dist entropy past the OOD side")
    p.add_argument("--base_shifts", type=float, nargs="*", default=[None],
                   help="cross-product base_shift candidates: smaller shift "
                        "puts OOD between the in-dist class manifolds "
                        "(genuinely ambiguous -> high OOD entropy) instead "
                        "of far off-manifold (confidently-wrong logits)")
    p.add_argument("--label_noises", type=float, nargs="*", default=[None],
                   help="cross-product label_noise candidates: an ALEATORIC "
                        "error floor of ~ln*(k-1)/k that leaves the class "
                        "geometry (and so the model's confidence profile + "
                        "OOD detectability) untouched — the knob that moves "
                        "error into the band without inverting OOD AUROC")
    p.add_argument("--ood_default", action="store_true",
                   help="resolve SVHN from its own production defaults "
                        "instead of mirroring the candidate override — the "
                        "production-true measurement: a "
                        "_SYNTH_DIFFICULTY['CIFAR100'] override only "
                        "touches the in-dist profile")
    args = p.parse_args()

    from ood_calibration import run_pair
    from ursabench_tpu.util import enable_compilation_cache

    enable_compilation_cache()

    out = {"separations": args.separations, "rows": [],
           "protocol": "config4: WRN-28x10 2-chain SGHMC burn8 draws2, "
                       "CIFAR100 vs SVHN"}
    if os.path.exists(ASSET):
        try:
            with open(ASSET) as f:
                out = json.load(f)
            out["separations"] = sorted(
                set(out.get("separations", [])) | set(args.separations))
        except Exception:
            pass
    candidates = [
        {"separation": sep,
         **({} if rho is None else {"field_overlap": rho}),
         **({} if shift is None else {"base_shift": shift}),
         **({} if ln is None else {"label_noise": ln})}
        for sep in args.separations for rho in args.field_overlaps
        for shift in args.base_shifts for ln in args.label_noises]
    for diff in candidates:
        t0 = time.perf_counter()
        row = run_pair(
            "WideResNet28x10", "CIFAR100", ["SVHN"],
            {"lr": 0.05, "prior_std": 1.0, "num_samples": 2,
             "alpha": 0.1, "burn_in_epochs": 8}, chains=2,
            difficulty=diff,
            ood_difficulty=None if args.ood_default else "same")
        row["wall_s"] = round(time.perf_counter() - t0, 1)
        out["rows"].append(row)
        print(json.dumps(row), flush=True)
        with open(ASSET, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
