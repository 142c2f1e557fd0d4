"""Minimal fixed-grid ODE integrators exposing the torchdiffeq API subset
the reference uses (``odeint(func, y0, t, method=...)``,
``/root/reference/src/model.py:103-106``). torchdiffeq cannot be installed
in this image (no network); the reference only ever calls fixed-grid
methods over an explicit time grid, so this ~30-line stand-in is exact:
one step per consecutive grid interval, fully differentiable torch ops.

Injected as ``sys.modules['torchdiffeq']`` by ``run_reference.py`` before
the reference's ``src.model`` is imported.
"""

import torch


def _step_euler(func, t0, dt, y):
    return y + dt * func(t0, y)


def _step_midpoint(func, t0, dt, y):
    k1 = func(t0, y)
    return y + dt * func(t0 + dt / 2, y + (dt / 2) * k1)


def _step_rk4(func, t0, dt, y):
    k1 = func(t0, y)
    k2 = func(t0 + dt / 2, y + (dt / 2) * k1)
    k3 = func(t0 + dt / 2, y + (dt / 2) * k2)
    k4 = func(t0 + dt, y + dt * k3)
    return y + (dt / 6) * (k1 + 2 * k2 + 2 * k3 + k4)


_STEPS = {"euler": _step_euler, "midpoint": _step_midpoint, "rk4": _step_rk4}


def odeint(func, y0, t, method="midpoint", rtol=None, atol=None,
           options=None):
    step = _STEPS[method]
    ys = [y0]
    y = y0
    for k in range(t.shape[0] - 1):
        t0, t1 = t[k], t[k + 1]
        y = step(func, t0, t1 - t0, y)
        ys.append(y)
    return torch.stack(ys, dim=0)


# The reference's adjoint=False config never exercises the adjoint path;
# plain autograd through the stepped graph is the correct fallback.
odeint_adjoint = odeint
