"""On-device Monte-Carlo samplers for the PDE domains.

Reference: ``src/dataset.py`` (Hypercube :232-290, NSphere_TCone :162-229,
NSphere_THourglass :48-159, Comb_loader :293-322, fillt :13-32).

TPU-native redesign
-------------------
The reference produces *ragged* path groups (lists of ``[n_k, L_k, d+1]``
tensors, one odeint call each) and densifies time grids at runtime with
``fillt``. Both are hostile to XLA (dynamic shapes, Python loops). Here:

* Every sampler emits a single static-shape :class:`PathBatch`:
  ``x: [N, L, C]`` (time at channel 0), a boolean validity ``mask [N, L]``,
  a per-path integration start time ``t_start [N]`` and a per-path seed
  selector ``seed_from_h [N]``. Raggedness becomes masking; the whole batch
  is one fused XLA program and shards over the mesh batch axis.

* Sample times are **stratified** (one uniform draw per bin of width
  ``(T-T0)/N_t``) instead of the reference's sorted-uniform + ``fillt``
  densification. A stratified grid has max gap ``<= 2(T-T0)/N_t``, so a
  *static* count of ``n_sub = ceil(2*min_steps/N_t)`` integrator substeps
  per interval guarantees the reference's fillt invariant (every ODE step
  ``<= (T-T0)/min_steps``, reference ``src/dataset.py:13-32``) with zero
  dynamic shapes — and is lower-variance for the quadrature.

* The hourglass domain's exit/re-entry path splitting (reference
  ``src/dataset.py:81-104``) becomes two static row blocks: rows ``[0, N_r)``
  are the from-``T0`` segments, rows ``[N_r, 2 N_r)`` are the boundary-
  re-entry segments (``t_start = |x|/r``, seeded from ``g`` — the reference's
  ``pad`` + ``bound_pad`` logic, ``src/dataset.py:77-79,127-152``), masked
  dead where a path never exits.

* Time-sliced boundary sampling with data-dependent counts
  ``n_l ∝ R(t_l)^d`` (reference ``src/dataset.py:203-214``) becomes
  inverse-CDF sampling of ``t`` with density ``∝ R(t)^d`` — the same
  distribution at a static ``N_b``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class PathBatch:
    """A static-shape batch of space-time sample paths.

    Layout contract (reference ``README.md:33``): ``x[N, L, C]`` with
    ``C = dim + 1``, time at channel 0, spatial coords constant along
    each path's time axis.
    """

    x: jax.Array            # [N, L, C]
    mask: jax.Array         # [N, L] bool — sample validity
    t_start: jax.Array      # [N]   — ODE integration start time
    seed_from_h: jax.Array  # [N] bool — seed from h(x) (else g(t_start, x))

    @property
    def times(self) -> jax.Array:
        return self.x[:, :, 0]

    @property
    def space(self) -> jax.Array:
        return self.x[:, :, 1:]

    @property
    def n_paths(self) -> int:
        return self.x.shape[0]

    @property
    def n_times(self) -> int:
        return self.x.shape[1]


def _fdtype(x64=None) -> jnp.dtype:
    """Float dtype for sampled data.

    ``x64=None`` follows the process-global ``jax_enable_x64`` flag;
    ``True``/``False`` pins the dtype per call site so solvers with
    different precisions can coexist in one process (the global flag is
    only ever *enabled*, never flipped off — see ``training.py``).
    """
    if x64 is None:
        x64 = jax.config.jax_enable_x64
    return jnp.float64 if x64 else jnp.float32


def stratified_times(key: jax.Array, T0: float, T: float, n: int,
                     dtype=None) -> jax.Array:
    """Sorted time grid: one uniform draw per bin, endpoints pinned.

    Replaces the reference's sorted ``uniform(T0, T)`` grid with pinned
    endpoints (``src/dataset.py:248-249``). Stratification bounds the max
    gap by ``2(T-T0)/n`` so no runtime ``fillt`` densification is needed.
    """
    dt = _fdtype() if dtype is None else dtype
    u = jax.random.uniform(key, (n,), dtype=dt)
    i = jnp.arange(n, dtype=dt)
    t = T0 + (i + u) * (T - T0) / n
    t = t.at[0].set(T0).at[-1].set(T)
    return t


def _unit_sphere(key: jax.Array, n: int, dim: int, dtype=None) -> jax.Array:
    """Uniform directions on S^{dim-1} (reference ``surf``, dataset.py:64-68)."""
    g = jax.random.normal(key, (n, dim),
                          dtype=_fdtype() if dtype is None else dtype)
    return g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-20)


def _ball(key: jax.Array, n: int, dim: int, radius: float,
          dtype=None) -> jax.Array:
    """Uniform points in a ball (reference dataset.py:82-83: surf * U^{1/d}).

    ``minval`` keeps samples strictly off the origin: ``uniform`` can return
    an exact 0, and ``grad ||x||`` at x=0 is NaN — it poisons the whole
    weak-form loss through ``grad(v*w)`` (observed as a deterministic NaN
    blowup ~6e5 draws into moving-domain training).
    """
    k1, k2 = jax.random.split(key)
    dt = _fdtype() if dtype is None else dtype
    dirs = _unit_sphere(k1, n, dim, dtype=dt)
    u = jax.random.uniform(k2, (n, 1), dtype=dt, minval=1e-6)
    return radius * dirs * u ** (1.0 / dim)


def _assemble(times_nl: jax.Array, x_spatial: jax.Array) -> jax.Array:
    """Broadcast per-path times [N,L] and spatial coords [N,d] into [N,L,C]."""
    n, l = times_nl.shape
    xs = jnp.broadcast_to(x_spatial[:, None, :], (n, l, x_spatial.shape[-1]))
    return jnp.concatenate([times_nl[:, :, None], xs], axis=-1)


def _anchored_paths(x: jax.Array, t_end: jax.Array, t_anchor: jax.Array,
                    seed_from_h: jax.Array, n_t: int, dtype) -> "PathBatch":
    """Boundary path batch: ``n_t`` samples from each point's anchor time
    to its supervision time, spatial point frozen (shared by the cone
    boundary and both hourglass boundary modes — one construction, so a
    fix in one mode cannot silently miss the others)."""
    frac = jnp.linspace(0.0, 1.0, n_t, dtype=dtype)
    times = t_anchor[:, None] + frac[None, :] * (t_end - t_anchor)[:, None]
    return PathBatch(
        x=_assemble(times, x),
        mask=jnp.ones((x.shape[0], n_t), dtype=bool),
        t_start=t_anchor,
        seed_from_h=seed_from_h,
    )


@dataclasses.dataclass(frozen=True)
class Hypercube:
    """Time-independent box ``[bot, top]^d`` (reference ``src/dataset.py:232-290``)."""

    shape_param: Tuple[float, float]  # (bot, top)
    dim: int
    T0: float
    T: float
    N_t: int
    x64: bool = None  # None: follow the global flag (see _fdtype)

    @property
    def _dt(self):
        return _fdtype(self.x64)

    def __post_init__(self):
        bot, top = self.shape_param
        assert top > bot, "The hypercube needs to have volume"

    @property
    def bot(self) -> float:
        return float(self.shape_param[0])

    @property
    def top(self) -> float:
        return float(self.shape_param[1])

    # Every interior path spans the full grid (mask all-true), so the
    # per-exit-group objective has exactly ONE occupied group and reduces
    # to the pooled estimator — the loss skips the segment_sum machinery
    # (TPU scatters, measured ~0.3 ms/outer step) when this is set.
    single_exit_group: bool = True

    # "halton": randomized-QMC interior cloud (shifted scrambled Halton,
    # ops/qmc.py) — same estimator, lower Monte-Carlo variance.
    qmc: str = "none"

    def interior_rows(self, n_r: int) -> int:
        return n_r

    def boundary_len(self) -> int:
        return self.N_t

    def interior(self, key: jax.Array, n_r: int) -> PathBatch:
        """Uniform spatial points replicated over a shared stratified grid
        (reference ``src/dataset.py:246-255``)."""
        kt, kx = jax.random.split(key)
        times = stratified_times(kt, self.T0, self.T, self.N_t,
                                 dtype=self._dt)
        if self.qmc == "halton":
            from xnode_wan_tpu.ops.qmc import qmc_uniform
            x = qmc_uniform(kx, n_r, self.dim, self._dt,
                            minval=self.bot, maxval=self.top)
        else:
            x = jax.random.uniform(kx, (n_r, self.dim), dtype=self._dt,
                                   minval=self.bot, maxval=self.top)
        times_nl = jnp.broadcast_to(times[None, :], (n_r, self.N_t))
        return PathBatch(
            x=_assemble(times_nl, x),
            mask=jnp.ones((n_r, self.N_t), dtype=bool),
            t_start=jnp.full((n_r,), self.T0, dtype=self._dt),
            seed_from_h=jnp.ones((n_r,), dtype=bool),
        )

    def boundary(self, key: jax.Array, n_b: int) -> PathBatch:
        """One face coordinate pinned per path (reference ``src/dataset.py:257-276``).

        Faces are assigned round-robin (``i % 2d``) instead of the
        reference's contiguous blocks + shuffle — same marginal
        distribution, exactly balanced counts.
        """
        kt, kx, kf = jax.random.split(key, 3)
        times = stratified_times(kt, self.T0, self.T, self.N_t,
                                 dtype=self._dt)
        if self.qmc == "halton":
            # The boundary penalty is an MC estimate too; the pinned face
            # coordinate overwrites one halton column per row. Faces get
            # CONTIGUOUS blocks of the base set (not the interior path's
            # round-robin): striding a Halton set by 2d fixes the leading
            # digit in every base dividing 2d, confining that column's
            # per-face marginal to a sub-interval (measured max gap 0.5-0.67
            # at d=3 — worse than iid), while contiguous segments keep the
            # low-discrepancy property (measured max gap ~0.03 vs iid ~0.06).
            from xnode_wan_tpu.ops.qmc import qmc_uniform
            x = qmc_uniform(kx, n_b, self.dim, self._dt,
                            minval=self.bot, maxval=self.top)
            face = (jnp.arange(n_b) * (2 * self.dim)) // n_b
        else:
            x = jax.random.uniform(kx, (n_b, self.dim), dtype=self._dt,
                                   minval=self.bot, maxval=self.top)
            face = jnp.arange(n_b) % (2 * self.dim)
        axis = face // 2
        val = jnp.where(face % 2 == 0, self.top, self.bot).astype(self._dt)
        x = x.at[jnp.arange(n_b), axis].set(val)
        times_nl = jnp.broadcast_to(times[None, :], (n_b, self.N_t))
        return PathBatch(
            x=_assemble(times_nl, x),
            mask=jnp.ones((n_b, self.N_t), dtype=bool),
            t_start=jnp.full((n_b,), self.T0, dtype=self._dt),
            seed_from_h=jnp.ones((n_b,), dtype=bool),
        )

    def func_w(self, x: jax.Array) -> jax.Array:
        """Min distance to any face (reference ``src/dataset.py:278-282``)."""
        xs = x[..., 1:]
        dist = jnp.minimum(jnp.abs(self.top - xs), jnp.abs(xs - self.bot))
        return jnp.min(dist, axis=-1)

    def entry(self, pts: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Per-point path origin for direct evaluation: ``(t_entry [M],
        seed_from_h [M])``. Time-independent domain: every point's
        straight-line path back to ``T0`` stays inside -> h-seed from T0
        (reference ``src/model.py:92-96`` degenerates to this case)."""
        m = pts.shape[0]
        return (jnp.full((m,), self.T0, dtype=pts.dtype),
                jnp.ones((m,), dtype=bool))

    def V(self) -> float:
        return (self.top - self.bot) ** self.dim * (self.T - self.T0)


def _ball_volume_coef(dim: int) -> float:
    return math.pi ** (dim / 2) / math.gamma(dim / 2 + 1)


@dataclasses.dataclass(frozen=True)
class NSphereTCone:
    """Shrinking sphere of radius ``r (1 - t)`` (reference ``src/dataset.py:162-229``).

    Time-varying domain; paths start inside at ``T0`` and leave when the
    boundary sweeps past them — the reference's reverse-time binning into
    ragged groups (``:185-201``) becomes the mask ``t < 1 - |x|/r``.

    ``path_boundary``: the reference supervises the boundary with
    single-time points (``:203-214``), but on a single-time path the XNODE
    reduces to ``readout(lift(g))`` — a scalar map that never constrains
    the ODE field. With ``path_boundary=True`` (default) each boundary
    sample becomes a *path*: integrate from ``T0`` (h-seed) along the
    frozen spatial point up to its exact exit time ``t_b = 1 - |x_b|/r``
    and compare ``u(t_b, x_b)`` with ``g`` there (``boundary_at_exit``).
    ``False`` restores reference-parity single-point supervision.
    """

    shape_param: float  # radius r
    dim: int
    T0: float
    T: float
    N_t: int
    path_boundary: bool = True
    x64: bool = None  # None: follow the global flag (see _fdtype)

    # "halton": randomized-QMC clouds (ops/qmc.py) — the ball and the
    # time-marginal inverse CDFs are smooth monotone maps, so the
    # low-discrepancy structure survives them (same estimator, lower
    # Monte-Carlo variance).
    qmc: str = "none"

    def __post_init__(self):
        # The radius laws, exit-time inversions, masks and V() below are
        # all written against absolute time with the reference's implicit
        # T0 = 0 (src/dataset.py:162-229 likewise hardcodes 1 - t). A
        # nonzero T0 would silently corrupt geometry (e.g. interior
        # points sampled in the full-radius ball that the t >= T0 domain
        # never attains) — reject it rather than degrade.
        if float(self.T0) != 0.0:
            raise ValueError(
                f"{type(self).__name__} requires T0 == 0 (got {self.T0}): "
                "its radius law is defined on absolute time from 0")

    @property
    def _dt(self):
        return _fdtype(self.x64)

    @property
    def r(self) -> float:
        return float(self.shape_param)

    @property
    def boundary_at_exit(self) -> bool:
        return self.path_boundary

    def interior_rows(self, n_r: int) -> int:
        return n_r

    def boundary_len(self) -> int:
        return self.N_t if self.path_boundary else 1

    def interior(self, key: jax.Array, n_r: int) -> PathBatch:
        kt, kx = jax.random.split(key)
        times = stratified_times(kt, self.T0, self.T, self.N_t,
                                 dtype=self._dt)
        if self.qmc == "halton":
            from xnode_wan_tpu.ops.qmc import qmc_ball
            x = qmc_ball(kx, n_r, self.dim, self.r, dtype=self._dt)
        else:
            x = _ball(kx, n_r, self.dim, self.r, dtype=self._dt)
        # Inside while r(1 - t) > |x|  (reference mask, dataset.py:192-195).
        t_exit = 1.0 - jnp.linalg.norm(x, axis=-1) / self.r
        mask = times[None, :] < t_exit[:, None]
        mask = mask.at[:, 0].set(True)  # all paths valid at T0
        times_nl = jnp.broadcast_to(times[None, :], (n_r, self.N_t))
        return PathBatch(
            x=_assemble(times_nl, x),
            mask=mask,
            t_start=jnp.full((n_r,), self.T0, dtype=self._dt),
            seed_from_h=jnp.ones((n_r,), dtype=bool),
        )

    def boundary(self, key: jax.Array, n_b: int) -> PathBatch:
        """Single-time boundary points with ``t``-density ``∝ (1-t)^d``.

        Inverse-CDF replacement for the reference's per-time-slice counts
        ``n_l = int(N_b (1-t_l)^d)`` (``src/dataset.py:203-214``): same
        distribution; static shape ``[N_b, 1, C]`` (single points) or
        ``[N_b, N_t, C]`` (boundary-anchored paths, see class docstring).
        """
        kt, kd = jax.random.split(key)
        d1 = self.dim + 1
        if self.qmc == "halton":
            from xnode_wan_tpu.ops.qmc import qmc_time_sphere
            u, dirs = qmc_time_sphere(kt, n_b, self.dim, self._dt)
        else:
            u = jax.random.uniform(kt, (n_b,), dtype=self._dt)
            dirs = _unit_sphere(kd, n_b, self.dim, dtype=self._dt)
        hi = (1.0 - self.T0) ** d1
        lo = (1.0 - self.T) ** d1
        t = 1.0 - (hi - u * (hi - lo)) ** (1.0 / d1)
        x = dirs * (self.r * (1.0 - t))[:, None]
        if not self.path_boundary:
            return PathBatch(
                x=_assemble(t[:, None], x),
                mask=jnp.ones((n_b, 1), dtype=bool),
                t_start=t,
                seed_from_h=jnp.zeros((n_b,), dtype=bool),
            )
        # path from T0 to the exit point: final sample lies exactly on the
        # moving boundary, intermediate samples are interior history
        return _anchored_paths(x, t, jnp.full_like(t, self.T0),
                               jnp.ones((n_b,), dtype=bool), self.N_t,
                               self._dt)

    def func_w(self, x: jax.Array) -> jax.Array:
        """``r(1 - t) - |x|`` (reference ``src/dataset.py:216-218``)."""
        dist = jnp.linalg.norm(x[..., 1:], axis=-1)
        return self.r * (1.0 - x[..., 0]) - dist

    def entry(self, pts: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Shrinking domain: a point inside at ``t`` was inside at every
        earlier time -> always the from-``T0`` h-seeded path."""
        m = pts.shape[0]
        return (jnp.full((m,), self.T0, dtype=pts.dtype),
                jnp.ones((m,), dtype=bool))

    def V(self) -> float:
        d1 = self.dim + 1
        timecomp = ((1 - self.T0) ** d1 - (1 - self.T) ** d1) / d1
        return _ball_volume_coef(self.dim) * self.r ** self.dim * timecomp


@dataclasses.dataclass(frozen=True)
class NSphereTHourglass:
    """Sphere of radius ``r((T-T0) - t)`` then ``r t`` — shrink, then regrow
    (reference ``src/dataset.py:48-159``).

    Paths can exit and re-enter. Reference splits each path into ragged
    entry/exit segments re-padded to their boundary-entry time
    (``:77-79,81-104,127-152``); here the interior batch has ``2 N_r``
    static rows: the first ``N_r`` are from-``T0`` segments masked dead
    after exit, the second ``N_r`` are re-entry segments with
    ``t_start = |x|/r``, seeded from ``g`` and masked dead before re-entry
    (or entirely, for paths that never exit).
    """

    shape_param: float  # radius scale r
    dim: int
    T0: float
    T: float
    N_t: int
    path_boundary: bool = True
    x64: bool = None  # None: follow the global flag (see _fdtype)
    waist_cap: bool = False  # ablation: map ascending-branch boundary
    # points to their descending-branch exit time instead of supervising
    # g at the true late-time location via a re-entry path (see boundary())

    # "halton": randomized-QMC clouds (see NSphereTCone.qmc)
    qmc: str = "none"

    def __post_init__(self):
        # Same absolute-time assumption as NSphereTCone: mid, radius_at,
        # the boundary inverse-CDF weights and V() all take T0 = 0
        # (matching the reference's hardcoded laws, src/dataset.py:48-159).
        if float(self.T0) != 0.0:
            raise ValueError(
                f"{type(self).__name__} requires T0 == 0 (got {self.T0}): "
                "its radius law is defined on absolute time from 0")

    @property
    def r(self) -> float:
        return float(self.shape_param)

    @property
    def _dt(self):
        return _fdtype(self.x64)

    @property
    def boundary_at_exit(self) -> bool:
        return self.path_boundary

    @property
    def mid(self) -> float:
        return (self.T - self.T0) / 2.0

    def radius_at(self, t: jax.Array) -> jax.Array:
        span = self.T - self.T0
        return self.r * jnp.where(t <= self.mid, span - t, t)

    def interior_rows(self, n_r: int) -> int:
        return 2 * n_r

    def boundary_len(self) -> int:
        return self.N_t if self.path_boundary else 1

    def interior(self, key: jax.Array, n_r: int) -> PathBatch:
        kt, kx = jax.random.split(key)
        span = self.T - self.T0
        times = stratified_times(kt, self.T0, self.T, self.N_t,
                                 dtype=self._dt)
        if self.qmc == "halton":
            from xnode_wan_tpu.ops.qmc import qmc_ball
            x = qmc_ball(kx, n_r, self.dim, self.r * span, dtype=self._dt)
        else:
            x = _ball(kx, n_r, self.dim, self.r * span, dtype=self._dt)
        rho = jnp.linalg.norm(x, axis=-1)
        never_exits = rho <= self.r * self.mid
        t_exit = jnp.where(never_exits, jnp.inf, span - rho / self.r)
        t_re = rho / self.r
        # Segment A: from T0 until the shrinking boundary passes the point.
        mask_a = times[None, :] < t_exit[:, None]
        mask_a = mask_a.at[:, 0].set(True)
        # Segment B: after the growing boundary re-absorbs it (only if it exited).
        mask_b = (times[None, :] > t_re[:, None]) & (~never_exits)[:, None]
        times_nl = jnp.broadcast_to(times[None, :], (n_r, self.N_t))
        return PathBatch(
            x=jnp.concatenate([_assemble(times_nl, x)] * 2, axis=0),
            mask=jnp.concatenate([mask_a, mask_b], axis=0),
            t_start=jnp.concatenate(
                [jnp.full((n_r,), self.T0, dtype=self._dt),
                 jnp.asarray(t_re, dtype=self._dt)]),
            seed_from_h=jnp.concatenate(
                [jnp.ones((n_r,), dtype=bool), jnp.zeros((n_r,), dtype=bool)]),
        )

    def boundary(self, key: jax.Array, n_b: int) -> PathBatch:
        """Boundary points with ``t``-density ``∝ R(t)^d`` via piecewise
        inverse CDF (reference's per-slice counts, ``src/dataset.py:106-117``)."""
        kt, kd = jax.random.split(key)
        d1 = self.dim + 1
        span = self.T - self.T0
        mid = self.mid
        # CDF on the descending branch: ((span-T0)^{d+1} - (span-t)^{d+1})/(d+1)
        c_mid = ((span - self.T0) ** d1 - (span - mid) ** d1) / d1
        c_tot = c_mid + (self.T ** d1 - mid ** d1) / d1
        if self.qmc == "halton":
            # the piecewise inverse CDF below is still one monotone map of
            # the scalar uniform, so QMC structure carries through both
            # branches
            from xnode_wan_tpu.ops.qmc import qmc_time_sphere
            u01, dirs = qmc_time_sphere(kt, n_b, self.dim, self._dt)
            u = u01 * c_tot
        else:
            u = jax.random.uniform(kt, (n_b,), dtype=self._dt) * c_tot
            dirs = _unit_sphere(kd, n_b, self.dim, dtype=self._dt)
        t_desc = span - ((span - self.T0) ** d1 - u * d1) ** (1.0 / d1)
        t_asc = ((u - c_mid) * d1 + mid ** d1) ** (1.0 / d1)
        t = jnp.where(u <= c_mid, t_desc, t_asc)
        x = dirs * self.radius_at(t)[:, None]
        if not self.path_boundary:
            return PathBatch(
                x=_assemble(t[:, None], x),
                mask=jnp.ones((n_b, 1), dtype=bool),
                t_start=t,
                seed_from_h=jnp.zeros((n_b,), dtype=bool),
            )
        if self.waist_cap:
            # Ablation (round-1 behavior): ascending-branch samples share
            # their spatial point with a descending-branch exit (|x| = r t_b
            # = R(span - t_b)) — supervise g at that earlier hit instead of
            # the true late-time location.
            t_hit = jnp.minimum(t, span - t)
            return _anchored_paths(x, t_hit, jnp.full_like(t, self.T0),
                                   jnp.ones((n_b,), dtype=bool), self.N_t,
                                   self._dt)
        # Honest supervision at the sampled (t, x) itself. Descending-branch
        # points were inside for all earlier times -> from-T0 h-seeded path.
        # Ascending-branch points (t > mid, so |x| = r t > r*mid) were
        # OUTSIDE during (span - |x|/r, |x|/r) -> anchor the path at the
        # re-entry time |x|/r with the g-seed (same recipe as entry()).
        # NOTE: an ascending-branch point on the boundary at time t has
        # |x| = r t, so its re-entry anchor IS t and the "path" is
        # deliberately zero-length: the model's value there is
        # readout(lift(g(t, x))) by its own g-seeded re-entry semantics,
        # and penalizing |u - g| at that point calibrates exactly that
        # readout∘lift-on-g composition every re-entered interior segment
        # depends on. This mirrors — not contradicts — how the interior
        # evaluates re-entered points.
        ascending = t > self.mid
        t_anchor = jnp.where(ascending, jnp.linalg.norm(x, axis=-1) / self.r,
                             jnp.full_like(t, self.T0))
        return _anchored_paths(x, t, t_anchor, ~ascending, self.N_t,
                               self._dt)

    def func_w(self, x: jax.Array) -> jax.Array:
        """Piecewise ``R(t) - |x|`` (reference ``src/dataset.py:119-125``)."""
        dist = jnp.linalg.norm(x[..., 1:], axis=-1)
        return self.radius_at(x[..., 0]) - dist

    def entry(self, pts: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Boundary-entry seeding for direct evaluation (reference
        ``src/model.py:92-96`` + ``bound_pad``, ``src/dataset.py:127-152``).

        An ascending-branch point ``(t > mid, |x| > r*mid)`` was OUTSIDE
        the domain during ``(span - |x|/r, |x|/r)``: its honest path starts
        at the re-entry time ``t_re = |x|/r`` with the ``g``-seed there.
        Everything else (waist points, descending branch) integrates from
        ``T0`` with the ``h``-seed.
        """
        t = pts[:, 0]
        rho = jnp.linalg.norm(pts[:, 1:], axis=-1)
        reentered = (t > self.mid) & (rho > self.r * self.mid)
        t_re = jnp.minimum(rho / self.r, t)  # clamp: on-boundary queries
        t_entry = jnp.where(reentered, t_re,
                            jnp.asarray(self.T0, pts.dtype))
        return t_entry.astype(pts.dtype), ~reentered

    def V(self) -> float:
        # ∫ c_d R(t)^d dt over both branches. Matches the reference's
        # hardcoded formula (src/dataset.py:154-159) for T0=0, T=1.
        d1 = self.dim + 1
        span = self.T - self.T0
        mid = self.mid
        desc = ((span - self.T0) ** d1 - (span - mid) ** d1) / d1
        asc = (self.T ** d1 - mid ** d1) / d1
        return _ball_volume_coef(self.dim) * self.r ** self.dim * (desc + asc)


DOMAIN_REGISTRY = {
    "Hypercube": Hypercube,
    "NSphere_TCone": NSphereTCone,
    "NSphereTCone": NSphereTCone,
    "NSphere_THourglass": NSphereTHourglass,
    "NSphereTHourglass": NSphereTHourglass,
}


def fillt(times: jax.Array, T: float, T0: float, min_steps: int = 5):
    """Reference-parity grid densifier (reference ``src/dataset.py:13-32``).

    Pads a sorted time vector so no gap exceeds ``(T - T0) / min_steps``;
    returns ``(idx, filled)`` where ``idx[i]`` locates ``times[i]`` in the
    filled grid. The TPU hot path never calls this — stratified sampling
    plus a static substep count provides the same invariant with static
    shapes (see module docstring) — but it is provided for users porting
    reference code that calls ``fillt`` directly. Host-side, dynamic
    output length; do not use under ``jit``.
    """
    import numpy as np

    t = np.asarray(times, dtype=float)
    h = (float(T) - float(T0)) / int(min_steps)
    out = [t[0]]
    idx = [0]
    for val in t[1:]:
        gap = val - out[-1]
        if gap > h:
            k = int(np.ceil(gap / h)) - 1
            out.extend(np.linspace(out[-1], val, k + 2)[1:-1].tolist())
        out.append(val)
        idx.append(len(out) - 1)
    filled = jnp.asarray(np.array(out), dtype=_fdtype())
    assert float(jnp.max(jnp.diff(filled))) <= h + 1e-9
    return jnp.asarray(np.array(idx)), filled


class CombLoader:
    """Reference-API batching shim (reference ``Comb_loader``,
    ``src/dataset.py:293-322``).

    The reference wraps a domain in a torch ``Dataset`` yielding ragged
    ``(datau, datav, bdata)`` group triples with ``requires_grad`` set.
    Here a single static-shape triple of :class:`PathBatch` es is produced
    (JAX needs no leaf-tensor bookkeeping: derivatives are taken
    functionally), with u and v sharing one interior cloud by default — see
    ``ops/weak_form.py`` for why that is the correct weak form. Pass
    ``independent_uv=True`` for the reference's two independent clouds
    (``src/dataset.py:306-310``).
    """

    def __init__(self, n_r: int, n_b: int, shape, key: jax.Array,
                 independent_uv: bool = False):
        k_i, k_b = jax.random.split(key)
        self.interioru = shape.interior(k_i, n_r)
        self.interiorv = (shape.interior(jax.random.fold_in(key, 7), n_r)
                          if independent_uv else self.interioru)
        self.boundary = shape.boundary(k_b, n_b)

    def __len__(self) -> int:
        return 1

    def __getitem__(self, idx: int):
        if idx != 0:
            raise IndexError(idx)
        return (self.interioru, self.interiorv, self.boundary)


def make_domain(name: str, shape_param, dim: int, T0: float, T: float,
                N_t: int, path_boundary: bool = True,
                waist_cap: bool = False, x64: bool = None,
                qmc: str = "none"):
    """Registry-based domain construction (replaces the reference's
    ``eval(params['domain'])``, ``src/training.py:84``)."""
    try:
        cls = DOMAIN_REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown domain {name!r}; available: {sorted(set(DOMAIN_REGISTRY))}"
        ) from None
    if cls is Hypercube:
        return cls(tuple(shape_param), dim, float(T0), float(T), int(N_t),
                   x64=x64, qmc=qmc)
    if isinstance(shape_param, (tuple, list)):
        shape_param = float(shape_param[-1])
    if cls is NSphereTHourglass:
        return cls(shape_param, dim, float(T0), float(T), int(N_t),
                   path_boundary=path_boundary, waist_cap=waist_cap, x64=x64,
                   qmc=qmc)
    return cls(shape_param, dim, float(T0), float(T), int(N_t),
               path_boundary=path_boundary, x64=x64, qmc=qmc)
