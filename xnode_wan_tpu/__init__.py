"""xnode_wan_tpu — a TPU-native weak-adversarial PDE solver (XNODE-WAN).

A from-scratch JAX/XLA/pjit implementation of the XNODE-WAN algorithm
("Towards fast weak adversarial training to solve high dimensional parabolic
partial differential equations using XNODE-WAN", Oliva/Wu/He/Ni, JCP 2022),
with the full capability surface of the PyTorch reference
(paulvoliva/XNODE-WAN-PDE-solver) re-designed TPU-first:

- static-shape ``[N, L, C]`` path batches with validity masks replacing the
  reference's ragged per-group tensors (reference ``src/dataset.py:93-104``),
- a single masked ``lax.scan`` fixed-step ODE integrator replacing
  torchdiffeq ``odeint`` + ``fillt`` grid densification
  (reference ``src/model.py:103-106``, ``src/dataset.py:13-32``),
- pointwise forward-mode input derivatives through the integrator
  (fixing the reference's ``.backward(ones)`` approximation,
  reference ``src/loss.py:55-63``),
- on-device ``jax.random`` Monte-Carlo samplers for all three domain
  families (hypercube, shrinking cone, hourglass),
- alternating optax Adam primal/adversarial updates fused into one jitted
  outer step, batch axis sharded over a ``jax.sharding.Mesh``.

Public API mirrors the reference's entry points: :class:`NODEWANSolver`
(reference ``src/training.py:54``), domain classes (``src/dataset.py``),
and the problem-definition callables ``func_a..func_g, u_sol, stop``
(reference ``main.py:51``).
"""

from xnode_wan_tpu.config import SolverConfig, load_params
from xnode_wan_tpu.ops.sampling import (
    Hypercube,
    NSphereTCone,
    NSphereTHourglass,
    PathBatch,
    DOMAIN_REGISTRY,
)
from xnode_wan_tpu.problems import Problem
from xnode_wan_tpu.training import NODEWANSolver

# Reference-compatible aliases (reference src/dataset.py class names).
NSphere_TCone = NSphereTCone
NSphere_THourglass = NSphereTHourglass
NODE_WAN_solver = NODEWANSolver

__all__ = [
    "SolverConfig",
    "load_params",
    "Hypercube",
    "NSphereTCone",
    "NSphereTHourglass",
    "NSphere_TCone",
    "NSphere_THourglass",
    "PathBatch",
    "DOMAIN_REGISTRY",
    "Problem",
    "NODEWANSolver",
    "NODE_WAN_solver",
]

__version__ = "0.1.0"
