from .export import export_bma_engine, load_engine, save_engine
from .latency import (ProfileConfig, build_amortized_engine, build_engine,
                      profile_config, run_sweep, time_amortized, time_engine)
from .tables import make_latex_table

__all__ = [
    "ProfileConfig", "build_amortized_engine", "build_engine",
    "profile_config", "run_sweep", "time_amortized", "time_engine",
    "make_latex_table",
    "export_bma_engine", "save_engine", "load_engine",
]
