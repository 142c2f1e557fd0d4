"""Shared fixed-step RK step bodies for the fused Pallas kernels.

Both the training kernel (``xnode_train.py`` — joint primal+tangent and
value-only interval walks) and the serving kernel (``xnode_eval.py``)
integrate the same XNODE field with the same four fixed-step schemes the
reference passes to torchdiffeq (``src/model.py:103-106``). The step
bodies are plain ``jnp`` code over a ``field(t, h)`` callable, usable
inside any Pallas kernel (or interpreter) — keeping ONE copy here means
a stepper fix cannot miss a kernel, and every kernel rejects unknown
method names the same way instead of silently substituting.

The JAX-level (non-kernel) steppers live in ``ops/integrate.py`` — they
carry masks/ragged handling the kernels don't need.
"""

from __future__ import annotations

# The fixed-step schemes the fused kernels implement. Adaptive methods
# and the Adams multisteps always take the XLA scan paths (accept/reject
# control flow and multistep histories don't map onto the kernels'
# bounded step loops).
FUSED_KERNEL_METHODS = ("euler", "midpoint", "heun", "rk4")


def rk_step(method: str, field, t, dt, h):
    """One fixed step of ``method`` from state ``h`` at time ``t``.

    ``field``, ``t``, ``dt`` and ``h`` follow whatever layout the caller
    uses (feature-major ``[H, B]`` in the kernels); only elementwise and
    ``field`` ops touch them. ``method`` is resolved at trace time.
    """
    if method == "euler":
        return h + dt * field(t, h)
    if method == "midpoint":
        k1 = field(t, h)
        return h + dt * field(t + 0.5 * dt, h + 0.5 * dt * k1)
    if method == "heun":
        k1 = field(t, h)
        return h + 0.5 * dt * (k1 + field(t + dt, h + dt * k1))
    if method == "rk4":
        k1 = field(t, h)
        k2 = field(t + 0.5 * dt, h + 0.5 * dt * k1)
        k3 = field(t + 0.5 * dt, h + 0.5 * dt * k2)
        k4 = field(t + dt, h + dt * k3)
        return h + dt * (k1 + 2 * k2 + 2 * k3 + k4) / 6.0
    raise ValueError(
        f"fused kernels implement {FUSED_KERNEL_METHODS}, got {method!r}"
        " — callers must gate on FUSED_KERNEL_METHODS (weak_form."
        "fused_gate / models.xnode.evaluate_points)")
