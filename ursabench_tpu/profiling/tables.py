"""LaTeX latency tables — parity with
/root/reference/URSABench/trtprof/make_table.py (fp16 vs fp32 x model x
dataset pivot, :26-83), for the fp32/bf16 XLA engines."""

from __future__ import annotations

from collections import defaultdict


def make_latex_table(cache: dict) -> str:
    """cache: key -> result dict from profiling.latency.run_sweep."""
    rows = defaultdict(dict)
    precisions = set()
    for r in cache.values():
        rows[(r["model"], r["dataset"], r["ensemble_size"], r["batch_size"])][
            r["precision"]
        ] = (r["latency_mean_s"], r["latency_std_s"])
        precisions.add(r["precision"])
    precs = sorted(precisions)
    header = (
        "\\begin{tabular}{llrr" + "r" * len(precs) + "}\n\\toprule\n"
        "model & dataset & S & batch & "
        + " & ".join(f"{p} latency (ms)" for p in precs)
        + " \\\\\n\\midrule\n"
    )
    body = []
    for (model, dataset, s, b), by_prec in sorted(rows.items()):
        cells = []
        for p in precs:
            if p in by_prec:
                m, sd = by_prec[p]
                cells.append(f"${m * 1e3:.2f} \\pm {sd * 1e3:.2f}$")
            else:
                cells.append("--")
        body.append(
            f"{model} & {dataset} & {s} & {b} & " + " & ".join(cells) + " \\\\"
        )
    return header + "\n".join(body) + "\n\\bottomrule\n\\end{tabular}"
