"""Unified CLI: ``python -m ursabench_tpu.cli <command> ...``

Commands mirror the reference's driver scripts (SURVEY.md §2.7):
  run      — benchmark runner (experiment.py parity)
  time     — sampler wall-time protocol (time_script.py parity)
  hypopt   — sequential BayesOpt (run_seq_hypOpt.py parity)
  hypopt-par — RandomSearch process fan-out (run_par_hypOpt.py parity)
  profile  — ensemble latency profiling (trtprof replacement)
  models   — list registered models
"""

from __future__ import annotations

import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    cmd, rest = argv[0], argv[1:]
    from .util import enable_compilation_cache

    enable_compilation_cache()
    if cmd == "run":
        from .experiment import main as run_main

        run_main(rest)
    elif cmd == "time":
        from .time_script import main as time_main

        time_main(rest)
    elif cmd == "hypopt":
        from .run_hypopt import main_seq

        main_seq(rest)
    elif cmd == "hypopt-par":
        from .run_hypopt import main_par

        main_par(rest)
    elif cmd == "profile":
        from .profiling.latency import main as prof_main

        prof_main(rest)
    elif cmd == "models":
        from . import models

        for name in models.list_models():
            print(name)
    else:
        print(f"Unknown command {cmd!r}.\n{__doc__}")
        return 2
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
