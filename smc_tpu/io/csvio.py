"""Posterior persistence as CSV (C23: methanation_functions.py:223-234 —
named-column Posterior_Distribution.csv + raw last_p_pred.csv; per-step
{step}_p_pred.csv at SMC_methanation_main.py:422)."""
from __future__ import annotations

import numpy as np


def save_particles_csv(path: str, particles) -> None:
    np.savetxt(path, np.asarray(particles), delimiter=",")


def save_posterior_csv(path: str, particles, param_names) -> None:
    p = np.asarray(particles)
    header = ",".join(param_names)
    np.savetxt(path, p, delimiter=",", header=header, comments="")


def load_particles_csv(path: str) -> np.ndarray:
    first = open(path).readline()
    skip = 0 if first.lstrip()[:1] in "-+.0123456789" else 1
    return np.loadtxt(path, delimiter=",", skiprows=skip)
