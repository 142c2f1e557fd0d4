"""2-D contour visualization of guess / exact / error.

Reference: ``utils/auxillary_funcs.py:34-98`` (``proj``) — slices the domain
along two chosen axes (free coordinates fixed at 0.5), evaluates the net on a
``resolution^2`` mesh, saves ``guess_cn.npy`` / ``error_cn.npy`` and
``plot_at_<k>_along_<axes>.png``. Plotting runs host-side off the hot path;
the mesh evaluation is one jitted batch.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence

import numpy as np

import jax.numpy as jnp


def proj(predict: Callable, dim: int, iteration: int,
         axes: Sequence[int] = (0, 1), T: float = 1.0, T0: float = 0.0,
         down: float = -1.0, up: float = 1.0, resolution: int = 100,
         colours: int = 8, save: bool = False, show: bool = False,
         func_u_sol: Optional[Callable] = None, work_dir: str = "./",
         domain=None) -> None:
    """Contour the solution guess along two axes.

    ``predict``: callable ``[M, C] -> [M]`` evaluating the primal net
    (e.g. a jitted ``evaluate_points`` closure).
    ``domain``: when given (moving domains), mesh points outside the
    domain (``func_w <= 0``) are masked to NaN so contours show only
    the honest region — the reference plotted the full hypercube slice
    regardless (``utils/auxillary_funcs.py:48-49``).
    """
    assert len(axes) == 2, "exactly two axes can be displayed"
    r = resolution
    xt = np.full((r, r, dim + 1), 0.5, dtype=np.float32)

    if 0 in axes:
        t_mesh = np.linspace(T0, T, r, dtype=np.float32)
    else:
        t_mesh = np.linspace(down, up, r, dtype=np.float32)
        xt[:, :, 0] = T
    x_mesh = np.linspace(down, up, r, dtype=np.float32)
    mesh1, mesh2 = np.meshgrid(x_mesh, t_mesh, indexing="ij")
    xt[:, :, axes[0]] = mesh2
    xt[:, :, axes[1]] = mesh1

    pts = jnp.asarray(xt.reshape(-1, dim + 1))
    guess = np.asarray(predict(pts)).reshape(r, r).astype(np.float64)
    if domain is not None and hasattr(domain, "func_w"):
        inside = np.asarray(jnp.asarray(domain.func_w(pts)) >= 0)
        guess = np.where(inside.reshape(r, r), guess, np.nan)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.clf()
    if func_u_sol is not None:
        sol = np.asarray(func_u_sol(pts)).reshape(r, r)
        error = guess - sol
        np.save(os.path.join(work_dir, "guess_cn.npy"), guess)
        np.save(os.path.join(work_dir, "error_cn.npy"), error)
        fig, ax = plt.subplots(3)
        panels = [sol, guess, error]
        for a, z in zip(ax, panels):
            cs = a.contourf(x_mesh, t_mesh, z.T, colours)
            fig.colorbar(cs, ax=a)
        ax[0].set_title("Correct Solution, Guess and Error")
    else:
        fig, ax = plt.subplots(1)
        cs = ax.contourf(x_mesh, t_mesh, guess.T, colours)
        fig.colorbar(cs, ax=ax)
        ax.set_title("Guess Solution")

    if save:
        fig.savefig(os.path.join(
            work_dir, f"plot_at_{iteration}_along_{list(axes)}.png"))
    if show:  # pragma: no cover - interactive only
        plt.show()
    plt.close(fig)
