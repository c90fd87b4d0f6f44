from .latency import ProfileConfig, build_engine, profile_config, run_sweep, time_engine
from .tables import make_latex_table

__all__ = [
    "ProfileConfig", "build_engine", "profile_config", "run_sweep",
    "time_engine", "make_latex_table",
]
