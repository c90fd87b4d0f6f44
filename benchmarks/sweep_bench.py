"""Vectorized-sweep benchmark: K hyperparameter configurations as ONE
device program (config-as-a-batch-axis, inference/vectorized.py) vs the
same K configurations run sequentially — the quantitative backing for the
"K configs cost far less than K sequential runs" claim (README), and the
TPU answer to the reference's one-subprocess-per-config sweep
(/root/reference/URSABench/run_par_hypOpt.py:78-79).

Writes assets/sweep_bench.json. Protocol: MLP200/MNIST SGHMC; best-of-5
steady-state epoch timings (warm compiles AND warm first executions — see
CLAUDE.md's remote-tunnel first-exec note): one vmapped epoch advancing
all K configs vs one epoch of a single config. `throughput_speedup` is
the config-epochs/sec ratio; `k_configs_cost_in_single_runs` says how
many sequential runs the K-way program costs.
"""

import json
import os
import time

ASSET = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "assets", "sweep_bench.json")
)


def main(K: int = 8):
    import jax
    import numpy as np

    from ursabench_tpu import data, inference, models
    from ursabench_tpu.inference.vectorized import SGHMCSweep
    from ursabench_tpu.util import enable_compilation_cache

    enable_compilation_cache()
    splits, C = data.loaders("MNIST", os.environ.get("URSA_DATA", "./data"),
                             batch_size=128, use_validation=False)
    module = models.get_model("MLP200MNIST").build(C)
    train = splits["train"]
    lrs = np.geomspace(0.01, 0.1, K)
    hyps = [
        {"lr": float(lr), "prior_std": 1.0, "num_samples": 2, "alpha": 0.1,
         "burn_in_epochs": 1}
        for lr in lrs
    ]

    def sync(tree):
        return np.asarray(jax.numpy.sum(jax.tree.leaves(tree)[0]))

    def best_of(fn, state_getter, reps=5):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            sync(state_getter())
            best = min(best, time.perf_counter() - t0)
        return best

    # --- vectorized: all K configs advance in one vmapped epoch program ---
    sweep = SGHMCSweep(hyps, model=module, train=train,
                       key=jax.random.PRNGKey(0))
    sweep._run_epoch(); sync(sweep._state.params)  # compile + first-exec
    t_vec = best_of(sweep._run_epoch, lambda: sweep._state.params)

    # --- sequential: the single-config epoch program, steady state ---
    s = inference.SGHMC(hyps[0], model=module, train=train,
                        key=jax.random.PRNGKey(1))
    s._run_epoch(noise_on=True); sync(s._state.params)
    t_seq = best_of(lambda: s._run_epoch(noise_on=True),
                    lambda: s._state.params)

    out = {
        "K": K,
        "vectorized_epoch_seconds": t_vec,  # K configs advance one epoch
        "single_config_epoch_seconds": t_seq,
        "throughput_speedup": K * t_seq / t_vec,  # config-epochs/sec ratio
        "k_configs_cost_in_single_runs": t_vec / t_seq,
        "device": str(jax.devices()[0]),
    }
    with open(ASSET, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
