"""Runnable walkthrough: solve the d=5 cube PDE end to end.

The script equivalent of the reference's ``example.ipynb`` (cells 4-11):
build the hyperparameter dict, define the PDE inline as JAX callables,
construct the solver, train with periodic reporting, then query the
trained network at arbitrary space-time points.

Run:  python examples/example.py  [--iterations 200] [--dim 5]
"""

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from xnode_wan_tpu import NODEWANSolver, Problem
from xnode_wan_tpu.config import SolverConfig

parser = argparse.ArgumentParser()
parser.add_argument("--iterations", type=int, default=200)
parser.add_argument("--dim", type=int, default=5)
parser.add_argument("--work_dir", default="./example_run")
args = parser.parse_args()

# --- hyperparameters (the reference notebook's config/setup dicts) ---------
params = {
    "alpha": 1e4 * 400 * 25,   # notebook cell 4: alpha = 1e4 * N_r * N_t-ish
    "u_layers": 8, "u_hidden_dim": 20, "u_hidden_hidden_dim": 10,
    "v_layers": 9, "v_hidden_dim": 50,
    "n1": 2, "n2": 1, "u_rate": 0.015, "v_rate": 0.04,
    "min_steps": 5, "adjoint": False, "solver": "midpoint",
    "dim": args.dim, "N_t": 20, "N_r": 400, "N_b": 400,
    "T0": 0.0, "T": 1.0, "shape_param": (-1.0, 1.0),
    "iterations": args.iterations, "domain": "Hypercube",
}
cfg = SolverConfig.from_dict(params)

# --- the PDE, defined inline (reference notebook cells 6 and 8) ------------
HP = math.pi / 2


def u_sol(X):
    return (2 * jnp.sin(HP * X[..., 1]) * jnp.cos(HP * X[..., 2])
            * jnp.exp(-X[..., 0]))


def f(X):
    sc = jnp.sin(HP * X[..., 1]) * jnp.cos(HP * X[..., 2])
    return ((math.pi ** 2 - 2) * sc * jnp.exp(-X[..., 0])
            - 4 * sc ** 2 * jnp.exp(-2 * X[..., 0]))


problem = Problem(
    name="example",
    h=lambda X: 2 * jnp.sin(HP * X[..., 1]) * jnp.cos(HP * X[..., 2]),
    f=f,
    g=u_sol,
    c=lambda X, u: -u,       # nonlinear reaction: c*u = -u^2
    a_kind="isotropic",      # diffusion matrix = identity
    b=None,                  # no drift
    u_sol=u_sol,
    stop_rel_err=0.01,
)

# --- train -----------------------------------------------------------------
solver = NODEWANSolver(cfg, problem, work_dir=args.work_dir)
metrics = solver.train(report=True, report_it=25)
print(f"final relative L2 error: {metrics.get('rel_err', float('nan')):.4f}")

# --- query the trained solution at arbitrary points ------------------------
pts = jnp.array([[0.5] + [0.3] * args.dim,
                 [1.0] + [0.1] * args.dim])
print("u(0.5, 0.3...):", solver.predict(pts))
print("exact:         ", u_sol(pts))
