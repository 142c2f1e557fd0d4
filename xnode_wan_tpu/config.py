"""Configuration for the XNODE-WAN solver.

The reference consumes a flat YAML dict and splits it *positionally* with
``itertools.islice`` (first 13 keys -> config, next 7 -> setup, next 1 ->
iterations; reference ``src/training.py:80-83``) and resolves the domain class
with ``eval()`` (``src/training.py:84``). Here the same YAML key set
(reference ``configs/cube_pde.yaml:1-24``) is parsed *by name* into a typed,
hashable dataclass, and domains come from an explicit registry — no ``eval``,
no ``globals()`` mutation.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping, Tuple

import yaml


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """All hyperparameters of a solver run.

    Field names match the reference YAML keys exactly
    (reference ``configs/cube_pde.yaml``): the 13 "config" keys, the 7
    "setup" keys, ``iterations`` and ``domain``.
    """

    # --- "config" block (reference src/training.py:81) ---
    alpha: float = 1e8          # weight of init+boundary penalty (loss.py:92)
    u_layers: int = 8           # depth of the ODE field MLP (model.py:70)
    u_hidden_dim: int = 20      # XNODE hidden state width (model.py:66)
    u_hidden_hidden_dim: int = 10  # ODE field MLP width (model.py:69)
    v_layers: int = 9           # discriminator depth (model.py:31)
    v_hidden_dim: int = 50      # discriminator width (model.py:32)
    n1: int = 2                 # primal steps per outer iteration
    n2: int = 1                 # adversarial steps per outer iteration
    u_rate: float = 0.015       # Adam lr for the primal net
    v_rate: float = 0.04        # Adam lr for the adversarial net
    min_steps: int = 5          # min ODE steps over [T0, T] (dataset.py:13)
    adjoint: bool = False       # reference's odeint_adjoint flag (alias for
                                # remat_scan here; remat is on by default)
    solver: str = "midpoint"    # fixed-step: euler|midpoint|heun|rk4|
                                # explicit_adams (AB4)|fixed_adams (ABM4
                                # PECE) — Adams order is capped at n_sub
                                # per interval (warned when < 4, see
                                # __post_init__); adaptive RK: dopri5|
                                # bosh3|adaptive_heun|fehlberg2|dopri8;
                                # adaptive-order multistep: adams (VCABM)
                                # — the torchdiffeq method surface the
                                # reference passes through,
                                # src/model.py:103-106

    # --- "setup" block (reference src/training.py:82) ---
    dim: int = 5
    N_t: int = 20               # sample times per path
    N_r: int = 4000             # interior Monte-Carlo paths
    N_b: int = 4000             # boundary Monte-Carlo points
    T0: float = 0.0
    T: float = 1.0
    shape_param: Any = (-1.0, 1.0)  # (bot, top) for Hypercube, radius for spheres

    # --- rest (reference src/training.py:83-84) ---
    iterations: int = 1000
    domain: str = "Hypercube"

    # --- TPU-native extensions (not in the reference) ---
    primal: str = "xnode"       # primal net family: "xnode" | "wan" (paper baseline)
    tied_v: bool = True         # reference ties all hidden v-layers (model.py:37-39)
    x64: bool = False           # f64 numerics-parity mode (reference is f64)
    seed: int = 0
    profile_dir: str = ""       # write a jax.profiler trace of iters [3, 8)
    debug_nans: bool = False    # functional-JAX "sanitizer": raise on NaN
    use_pallas: bool = True     # fused Pallas kernel on the TPU eval path
    fused_grad: bool = True     # fused Pallas (u, grad_x u) custom-VJP
                                # kernel on the single-chip TPU training
                                # path (ops/pallas/xnode_train.py); False
                                # falls back to the XLA vmap(jvp) scan
    fused_chunk: bool = False   # when the full-d fused kernel exceeds
                                # scoped VMEM (d=50, wide d=20), run it in
                                # d_chunk-tangent chunks (fused_chunk()
                                # picks the largest divisor of d that
                                # fits) instead of falling back to XLA
    fused_chunk_max: int = 2    # most chunks the opt-in above may split
                                # into before falling back to XLA anyway:
                                # measured break-even is ~2 chunks
                                # (benchmarks/microbench_d20wide_chunk
                                # .json ~parity at 2; _d50_ loses at 5) —
                                # raise only to reproduce those A/B runs
    compile_cache: str = "auto"  # persistent XLA compile cache: "auto" =
                                # $JAX_CACHE_DIR or ~/.cache/xnode_wan_tpu,
                                # "" = off, else an explicit directory.
                                # Cold compile dominates short runs (~99 s
                                # vs ~1 s of d=5 training, DESIGN §13);
                                # the cache makes every rerun warm (~6 s)
    grad_clip: float = 0.0      # optax global-norm clip (0 = off, as reference)
    lr_decay: float = 1.0       # exponential lr decay rate per 1000 steps
                                # (1.0 = constant, as reference)
    boundary_paths: bool = True  # moving domains: boundary-anchored paths
                                # supervised at the exit point (False =
                                # reference-parity single-time points)
    waist_cap: bool = False     # hourglass ablation: supervise ascending-
                                # branch boundary points at their earlier
                                # descending-branch exit (round-1 behavior)
                                # instead of the true late-time location
    fused_v: bool = False       # opt-in adversary-side fused Pallas kernel
                                # (ops/pallas/disc_train.py). Measured
                                # SLOWER than the XLA vmap(value_and_grad)
                                # path on the d=5 hot step (6.56 vs
                                # 6.13 ms — kernel-launch overhead beats
                                # the fusion gain at 50-wide MLP shapes,
                                # docs/DESIGN.md §14); kept for large-n2 /
                                # wide-adversary recipes.
    group_loss: bool = True     # one log-ratio channel per exit-time path
                                # group (reference src/training.py:128-137);
                                # identical to the pooled estimator on the
                                # hypercube (single group)
    s1_raw_v: bool = False      # reference-parity temporal term with raw v
                                # (loss.py:64); default uses phi = v*w, the
                                # IBP-consistent form (see ops/weak_form.py)
    init_all_rows: bool = False  # reference-parity: penalize u(t_first)-h
                                # on ALL rows (reference src/loss.py:78-80
                                # applies h even to boundary re-entry
                                # segments); default restricts the init
                                # term to h-seeded paths (re-entry rows
                                # start from g, not h). Identical on the
                                # Hypercube (every row starts at T0)
    independent_uv: bool = False  # reference-parity: draw an INDEPENDENT
                                # interior cloud for the v side and pair
                                # u(X) with phi(XV) elementwise (reference
                                # src/dataset.py:306-310, src/loss.py:51-70);
                                # default shares one cloud (the consistent
                                # pointwise weak-form estimator)
    ema_decay: float = 0.0      # >0: Polyak/EMA average of the primal
                                # iterates (bias-corrected ramp); metrics,
                                # stop criterion, best-checkpoints and
                                # serving use the average. Smooths the
                                # adversarial + fresh-sample MC noise of
                                # the late trajectory at ~zero step cost
    ensemble: int = 1           # K>1: train K independent seeds in one
                                # vmapped program, keep/report the best —
                                # principled multi-start (replaces the
                                # stall_action="restart" heuristic)
    data_axis: str = "data"     # mesh axis the path batch is sharded over
    tangent_shards: int = 1     # >1: 2-D mesh, forward-mode tangent batch
                                # sharded over a second axis (d=20-50 runs)
    remat_scan: bool = True     # checkpoint each scan step: recompute
                                # activations on the backward pass instead
                                # of storing 38 per-step tensors to HBM —
                                # measured FASTER (22.2 -> 16.3 ms/iter,
                                # d=5 N_r=4000) because the step is
                                # HBM-bandwidth-bound, and O(1)-in-L memory
    scan_unroll: int = 1        # unroll factor of the XLA time-loop scan
                                # (0 = fully unroll). Default 1: measured
                                # strictly better on BOTH paths at d=5 —
                                # fused kernel active (scan carries only
                                # the boundary term): compile 9.6 s vs
                                # 24.2 s full-unroll at an equal 6 ms
                                # step; XLA fallback: compile 21.3 s vs
                                # 91.1 s AND the step 21% faster (6.9 vs
                                # 8.7 ms) — benchmarks/compile_budget
                                # .json (supersedes the round-1 full-
                                # unroll recommendation, which predates
                                # the fused kernel + remat restructuring)
    fourier_features: int = 0   # K>0: append sin/cos(k*pi/2*x), k=1..K to
                                # the ODE-field input — spectral features
                                # for high-d oscillatory targets (the d=20
                                # product-of-sines stress); 0 = reference
                                # parity (raw coordinates only)
    v_fourier_features: int = 0  # same Fourier bank on the discriminator
                                # input (the adversary must resolve the
                                # oscillatory residual structure too)
    train_chunk: int = 10       # outer iterations per device dispatch in
                                # train(): the host replays logging/stop
                                # hooks from stacked metrics once per
                                # chunk, so the ~30 ms dispatch round-trip
                                # amortizes over `train_chunk` ~10 ms
                                # steps. 1 = per-iteration dispatch
                                # (reference-like; used when profiling)
    window_target_s: float = 60.0  # train_until: halve the while_loop
                                # window when one full window overruns
                                # this wall-clock budget (device-watchdog
                                # protection; see training.train_until)
    ode_rtol: float = 1e-5      # dopri5 relative error tolerance
    ode_atol: float = 1e-6      # dopri5 absolute error tolerance
    ode_max_steps: int = 16     # dopri5 static bound on accept/reject
                                # attempts per sample interval (bounded
                                # fori_loop, one fixed XLA program — see
                                # ops/integrate.integrate_adaptive)
    ode_strict: bool = False    # dopri5 budget exhaustion: True NaN-poisons
                                # the interval (torchdiffeq's max_num_steps
                                # error, loud under debug_nans); False takes
                                # one forced error-unchecked full-span step
                                # (graceful, tolerance no longer guaranteed)
    qmc: str = "none"           # "halton": randomized-QMC sample clouds
                                # (shifted scrambled Halton, ops/qmc.py) —
                                # same weak-form estimator, lower MC
                                # variance, zero extra per-step cost. All
                                # domains (moving domains map the set
                                # through their smooth monotone inverse
                                # CDFs); "none" = i.i.d. uniform
                                # (reference parity, src/dataset.py:246)
    u_scale: float = 1.0        # model-level output scale: the primal net
                                # internally sees seed/u_scale and returns
                                # net*u_scale, keeping activations O(1) for
                                # problems with large solution amplitude
                                # (Ex4_3 at d=20: (pi/2)^20 ~ 1.7e4).
                                # 0 = auto (rms of h over a probe sample).
                                # 1 = reference parity (no scaling)
    p: float = 2.0              # L^p norm for error reporting

    def __post_init__(self):
        # Coerce numerics: PyYAML 1.1 parses exponent floats without a sign
        # ("1.0e8") as *strings*; the reference YAML uses plain ints anyway.
        for name in ("alpha", "u_rate", "v_rate", "T0", "T", "p",
                     "ode_rtol", "ode_atol", "ema_decay", "window_target_s",
                     "grad_clip", "lr_decay", "u_scale"):
            object.__setattr__(self, name, float(getattr(self, name)))
        for name in ("u_layers", "u_hidden_dim", "u_hidden_hidden_dim",
                     "v_layers", "v_hidden_dim", "n1", "n2", "min_steps",
                     "dim", "N_t", "N_r", "N_b", "iterations", "seed",
                     "ensemble", "ode_max_steps", "train_chunk",
                     "tangent_shards", "fourier_features",
                     "v_fourier_features", "scan_unroll"):
            # via float() first: int("6.4e1") raises, int(float(...)) works
            object.__setattr__(self, name, int(float(getattr(self, name))))
        if self.ensemble < 1:
            raise ValueError("ensemble must be >= 1")
        if not 0.0 <= self.ema_decay < 1.0:
            raise ValueError("ema_decay must be in [0, 1)")
        if isinstance(self.shape_param, list):
            object.__setattr__(self, "shape_param", tuple(self.shape_param))
        if self.u_layers < 1:
            # The reference's num_layers==0 branch builds a Linear(in, in-1)
            # with mismatched dims (model.py:138) and cannot run; reject it.
            raise ValueError("u_layers must be >= 1")
        valid = ("euler", "midpoint", "heun", "rk4", "explicit_adams",
                 "fixed_adams", "dopri5", "bosh3", "adaptive_heun",
                 "fehlberg2", "dopri8", "adams")
        if self.solver not in valid:
            hint = ""
            if self.solver == "implicit_adams":
                # not a torchdiffeq-0.1.1 name (the reference's pin);
                # point at the two Adams solvers that do exist here.
                hint = (" ('fixed_adams' is the fixed-step "
                        "predictor-corrector Adams, 'adams' the "
                        "adaptive-order VCABM)")
            raise ValueError(
                f"unknown solver {self.solver!r}; valid: {valid}{hint}")
        if self.ode_max_steps < 1:
            raise ValueError("ode_max_steps must be >= 1")
        if self.solver in ("explicit_adams", "fixed_adams") and self.n_sub < 4:
            # The multistep history restarts at every sample-interval seam
            # (the per-path stratified grids are non-uniform there, so the
            # uniform-step Adams coefficients would be invalid across it —
            # ops/integrate.py). Within an interval the order ramps 1->4
            # with the substep count, so n_sub caps the effective order:
            # at n_sub=1 explicit_adams IS euler and fixed_adams a single
            # trapezoid PECE step. Warn rather than reject — the result is
            # still a consistent (low-order) integrator.
            import warnings
            warnings.warn(
                f"solver={self.solver!r} with n_sub={self.n_sub} (from "
                f"min_steps={self.min_steps}, N_t={self.N_t}): multistep "
                "history restarts at each of the N_t sample intervals, so "
                f"the effective Adams order is capped at {self.n_sub}, not "
                "4. Raise min_steps (n_sub = ceil(2*min_steps/N_t) >= 4) "
                "to reach the advertised AB4/ABM4 order.",
                stacklevel=2)
        if self.primal not in ("xnode", "wan"):
            raise ValueError(f"unknown primal model {self.primal!r}")
        if self.N_t < 2:
            raise ValueError("N_t must be >= 2 (need both endpoints)")
        if self.T <= self.T0:
            raise ValueError("need T > T0")
        if self.qmc not in ("none", "halton"):
            raise ValueError(f"unknown qmc {self.qmc!r}; valid: none, halton")
        if self.independent_uv and self.domain != "Hypercube":
            # The reference only draws independent u/v clouds for
            # single-group (hypercube) domains and clones the points for
            # list-type ones (src/dataset.py:306-310 + group handling).
            # On a moving domain an independent v cloud has its own
            # valid/invalid structure: invalid v positions can sit outside
            # the domain where func_w < 0, silently flipping phi's sign in
            # the paired estimator. Reject rather than corrupt.
            raise ValueError(
                "independent_uv=true is only meaningful on the Hypercube "
                "domain (the reference pairs independent u/v clouds only "
                "there); on moving domains the v cloud's own masking "
                "would silently corrupt the paired weak-form estimator")

    # Effective output normalization: u_scale <= 0 means "off" (scale 1).
    # Every seeding/readout site divides/multiplies by this one value —
    # keep the fallback rule here, not re-derived per call site.
    @property
    def u_scale_eff(self) -> float:
        return self.u_scale if self.u_scale > 0 else 1.0

    # Static substep count guaranteeing the fillt invariant (see sampling.py):
    # stratified time grids have max gap <= 2*(T-T0)/N_t, so n_sub substeps
    # per interval keep every ODE step <= (T-T0)/min_steps
    # (the reference's fillt guarantee, dataset.py:13-32).
    @property
    def n_sub(self) -> int:
        return max(1, -(-2 * self.min_steps // max(self.N_t, 1)))

    @property
    def time_span(self) -> Tuple[float, float]:
        return (self.T0, self.T)

    @classmethod
    def from_dict(cls, params: Mapping[str, Any]) -> "SolverConfig":
        """Build from a reference-style flat params dict (extra keys rejected)."""
        names = {f.name for f in dataclasses.fields(cls)}
        unknown = set(params) - names
        if unknown:
            raise KeyError(f"unknown config keys: {sorted(unknown)}")
        return cls(**dict(params))

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def replace(self, **kw) -> "SolverConfig":
        return dataclasses.replace(self, **kw)

    # Reference-compat views (src/training.py:80-83 "config"/"setup" split).
    @property
    def config(self) -> dict:
        keys = ("alpha", "u_layers", "u_hidden_dim", "u_hidden_hidden_dim",
                "v_layers", "v_hidden_dim", "n1", "n2", "u_rate", "v_rate",
                "min_steps", "adjoint", "solver")
        d = self.to_dict()
        return {k: d[k] for k in keys}

    @property
    def setup(self) -> dict:
        keys = ("dim", "N_t", "N_r", "N_b", "T0", "T", "shape_param")
        d = self.to_dict()
        return {k: d[k] for k in keys}


def load_params(path: str) -> SolverConfig:
    """Load a reference-style YAML params file (configs/cube_pde.yaml keys)."""
    with open(path, "r") as fh:
        raw = yaml.safe_load(fh)
    return SolverConfig.from_dict(raw)
