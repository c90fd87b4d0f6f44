"""LaTeX latency tables — parity with
/root/reference/URSABench/trtprof/make_table.py (fp16 vs fp32 x model x
dataset pivot, :26-83), for the fp32/bf16 XLA engines."""

from __future__ import annotations

from collections import defaultdict


_CAPTION = (
    "% per-call: protocol-faithful dispatch + device->host fetch per rep\n"
    "%   (prof.py:153-171 analogue). Over a remote device tunnel every call\n"
    "%   pays the RPC round-trip (~28 ms on the axon stack), so small-model\n"
    "%   per-call rows measure the tunnel floor, not the chip.\n"
    "% device: K forwards in one jitted lax.fori_loop, one fetch, /K —\n"
    "%   chip execution time. %%peak = achieved FLOP/s over the device's\n"
    "%   bf16 peak for every precision (fp32/int8 rows are percent of the\n"
    "%   bf16 number, not of a per-precision peak).\n"
    "% hbm_* fields derive from XLA's cost-model 'bytes accessed' — an\n"
    "%   upper-bound estimate that can overcount fused reads severalfold\n"
    "%   (and thus read >100%% of peak); treat as relative, not measured.\n"
)


def _fmt_ms(mean_s, std_s):
    if std_s is None:
        return f"${mean_s * 1e3:.3f}$"
    return f"${mean_s * 1e3:.3f} \\pm {std_s * 1e3:.3f}$"


def make_latex_table(cache: dict) -> str:
    """cache: key -> result dict from profiling.latency.run_sweep. Renders a
    per-call latency column per precision (when measured) plus, when the
    device-amortized mode was run, a device latency and percent-of-peak
    column per precision."""
    rows = defaultdict(dict)
    precisions = set()
    has_call = has_amort = False
    for r in cache.values():
        rows[(r["model"], r["dataset"], r["ensemble_size"], r["batch_size"])][
            r["precision"]
        ] = r
        precisions.add(r["precision"])
        has_call |= "latency_mean_s" in r
        has_amort |= "amortized_latency_s" in r
    precs = sorted(precisions)
    cols, heads = [], []
    if has_call:
        cols.append("call")
        heads += [f"{p} call (ms)" for p in precs]
    if has_amort:
        cols += ["dev", "mfu"]
        heads += [f"{p} device (ms)" for p in precs]
        heads += [f"{p} \\%peak" for p in precs]
    header = (
        _CAPTION
        + "\\begin{tabular}{llrr" + "r" * len(precs) * len(cols)
        + "}\n\\toprule\nmodel & dataset & S & batch & "
        + " & ".join(heads) + " \\\\\n\\midrule\n"
    )
    body = []
    for (model, dataset, s, b), by_prec in sorted(rows.items()):
        cells = []
        for kind in cols:
            for p in precs:
                r = by_prec.get(p)
                if r is None:
                    cells.append("--")
                elif kind == "call" and "latency_mean_s" in r:
                    cells.append(_fmt_ms(r["latency_mean_s"],
                                         r.get("latency_std_s")))
                elif kind == "dev" and "amortized_latency_s" in r:
                    cells.append(_fmt_ms(r["amortized_latency_s"],
                                         r.get("amortized_latency_std_s")))
                elif kind == "mfu" and r.get("mfu_pct_of_bf16_peak") is not None:
                    cells.append(f'{r["mfu_pct_of_bf16_peak"]:.1f}')
                else:
                    cells.append("--")
        body.append(
            f"{model} & {dataset} & {s} & {b} & " + " & ".join(cells) + " \\\\"
        )
    return header + "\n".join(body) + "\n\\bottomrule\n\\end{tabular}"
