"""VAE temporal-ops experiment harness (reference: dynamic_enumeration*.py,
run_experiments_*.sh, analysis.ipynb)."""
from .enumeration import base_config, enumerate_configs, write_configs
from .runner import (ExperimentResult, bucket_tensors, rank_results,
                     run_experiment, run_sweep)

__all__ = [
    "base_config", "enumerate_configs", "write_configs", "ExperimentResult",
    "bucket_tensors", "rank_results", "run_experiment", "run_sweep",
]
