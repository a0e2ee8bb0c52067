"""Experiment bootstrap: dump params, create checkpoint dir, logger, stats.

Capability parity with /root/reference/utils.py:155-188 (``initialize_exp``)
and ``fix_random_seeds`` (utils.py:277-283) — in JAX the seed feeds explicit
PRNG keys plus a numpy Generator for host-side randomness (augmentation
order, head shuffles, swap search), replacing torch/numpy global seeding.
"""

from __future__ import annotations

import os
import pickle
from pathlib import Path

import jax
import numpy as np

from selavi_tpu.utils.logger import PDStats, create_logger


def initialize_exp(params, *stat_columns, dump_params: bool = True):
    """Returns (logger, PDStats). ``params`` is any object with a
    ``dump_path`` attribute (argparse Namespace or Config)."""
    rank = jax.process_index()
    dump_path = Path(params.dump_path)
    dump_path.mkdir(parents=True, exist_ok=True)

    if dump_params and rank == 0:
        with open(dump_path / "params.pkl", "wb") as f:
            pickle.dump(params, f)

    params.dump_checkpoints = str(dump_path / "checkpoints")
    if rank == 0:
        os.makedirs(params.dump_checkpoints, exist_ok=True)

    training_stats = PDStats(
        str(dump_path / f"stats{rank}.pkl"), list(stat_columns)
    )
    logger = create_logger(str(dump_path / "train.log"), rank=rank)
    logger.info("============ Initialized logger ============")
    logger.info(
        "\n".join(
            "%s: %s" % (k, str(v))
            for k, v in sorted(dict(vars(params)).items())
        )
    )
    logger.info("The experiment will be stored in %s\n" % params.dump_path)
    return logger, training_stats


def fix_random_seeds(seed: int = 31):
    """Returns (jax PRNG key, numpy Generator)."""
    np.random.seed(seed)
    return jax.random.PRNGKey(seed), np.random.default_rng(seed)
