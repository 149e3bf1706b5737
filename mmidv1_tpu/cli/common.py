"""Shared CLI plumbing: platform selection, logging, Spain-2020 pipeline setup.

Replaces the boilerplate shared by the reference's seven executables
(``src/model/main.cpp``, ``src/sir_age_structured/main.cpp``,
``src/base/main/*.cpp``): Logger setup, project-root discovery, the
data/configuration load sequence of ``main.cpp:182-260``.
"""

from __future__ import annotations

import dataclasses
import os
from typing import NamedTuple, Optional

import numpy as np

from ..utils.fileutils import get_project_root, join_paths
from ..utils.logging import get_logger


def setup_jax(platform: Optional[str] = None, x64: bool = False,
              cache_dir: Optional[str] = None):
    """Configure JAX before first use. ``platform=None`` keeps the default
    backend (the real TPU in this environment); 'cpu' forces host execution.
    Note the JAX_PLATFORMS env var is ineffective here — the TPU plugin
    registers at interpreter startup — so the config API is used."""
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    if x64:
        jax.config.update("jax_enable_x64", True)
    root = cache_dir or join_paths(get_project_root(), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", root)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return jax


class SpainPipeline(NamedTuple):
    """Everything main.cpp assembles before calibration (:182-316)."""

    root: str
    data: object           # CalibrationData
    params: object         # SEPAIHRDParams
    space: object          # ParameterSpace
    ts: np.ndarray         # full grid incl. run-up
    theta0: np.ndarray
    settings: dict         # {algorithm_name: settings dict}


def load_spain_pipeline(root: Optional[str] = None, *, num_days: Optional[int] = None,
                        dtype=None, start_date: str = "2020-03-01",
                        end_date: str = "2020-12-31") -> SpainPipeline:
    """Load the reference-compatible configuration tree
    (``data/configuration/*`` + ``data/contacts.csv`` +
    ``data/processed/processed_data.csv``) exactly as ``main.cpp:208-260``."""
    import jax.numpy as jnp

    from ..calibration.objective import make_time_grid
    from ..calibration.param_space import ParameterSpace
    from ..data import (CalibrationData, read_param_bounds,
                        read_params_to_calibrate, read_proposal_sigmas,
                        read_sepaihrd_parameters, read_settings)
    from ..data.contact_matrix import read_matrix_from_csv

    log = get_logger("cli")
    root = root or get_project_root()
    cfg = join_paths(root, "data", "configuration")
    if dtype is None:
        dtype = jnp.zeros(0).dtype

    data = CalibrationData.from_csv(
        join_paths(root, "data", "processed", "processed_data.csv"),
        start_date, end_date)
    if num_days is not None and num_days < data.n_data_points:
        fields = ("new_confirmed", "new_deaths", "new_hospitalizations",
                  "new_icu", "cumulative_confirmed", "cumulative_deaths",
                  "cumulative_hospitalizations", "cumulative_icu")
        data = dataclasses.replace(
            data, **{f: getattr(data, f)[:num_days] for f in fields},
            dates=data.dates[:num_days])
    M = read_matrix_from_csv(join_paths(root, "data", "contacts.csv"), 4, 4)
    params = read_sepaihrd_parameters(
        join_paths(cfg, "initial_guess.txt"), 4,
        N=data.population_by_age, M_baseline=M, dtype=dtype)

    names = read_params_to_calibrate(join_paths(cfg, "params_to_calibrate.txt"))
    bounds = read_param_bounds(join_paths(cfg, "param_bounds.txt"))
    sigmas = read_proposal_sigmas(join_paths(cfg, "proposal_sigmas.txt"))
    space = ParameterSpace.create(names, bounds, sigmas, params)
    ts = make_time_grid(float(np.asarray(params.runup_days)), data.n_data_points)
    theta0 = np.asarray(space.extract(params))

    settings = {}
    for key, fname in (("mcmc", "mcmc_settings.txt"),
                       ("pso", "pso_settings.txt"),
                       ("hill", "hill_climbing_settings.txt"),
                       ("nuts", "nuts_settings.txt")):
        path = join_paths(cfg, fname)
        if os.path.exists(path):
            settings[key] = read_settings(path)

    log.info(f"loaded Spain-2020 pipeline: {space.dim} calibratable params, "
             f"{data.n_data_points} observation days, grid {len(ts)} points")
    return SpainPipeline(root=root, data=data, params=params, space=space,
                         ts=ts, theta0=theta0, settings=settings)
