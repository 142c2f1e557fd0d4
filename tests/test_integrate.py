"""Integrator checks: closed forms, convergence order, masking semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xnode_wan_tpu.ops.integrate import integrate, integrate_adaptive


def _grid(n, l):
    t = jnp.linspace(0.0, 1.0, l)
    return jnp.broadcast_to(t, (n, l))


def test_linear_ode_exact_decay():
    # dh/dt = -h  ->  h(t) = exp(-t)
    field = lambda t, h: -h
    h0 = jnp.ones((4, 3))
    times = _grid(4, 9)
    mask = jnp.ones((4, 9), bool)
    hs = integrate(field, h0, times, jnp.zeros(4), mask, n_sub=4,
                   method="rk4")
    expect = np.broadcast_to(np.exp(-np.asarray(times))[:, :, None],
                             (4, 9, 3))
    np.testing.assert_allclose(np.asarray(hs), expect, rtol=1e-5, atol=1e-6)


# n_sub pairs chosen so the finer error stays above the f32 roundoff floor.
# The Adams methods restart their history each interval with an order
# ramp (1 -> 4), so the observed GLOBAL order is startup-limited: the
# single order-1 (resp. order-2 corrected) first substep dominates —
# measured rates ~2.0 / ~3.0 on this problem.
@pytest.mark.parametrize("method,order,subs", [
    ("euler", 1, (8, 16)), ("midpoint", 2, (8, 16)),
    ("heun", 2, (8, 16)), ("rk4", 4, (2, 4)),
    ("explicit_adams", 2.0, (16, 32)), ("fixed_adams", 3.0, (8, 16))])
def test_convergence_order(method, order, subs):
    field = lambda t, h: -h
    h0 = jnp.ones((1, 1))
    times = _grid(1, 2)  # single interval [0, 1]
    mask = jnp.ones((1, 2), bool)

    def err(n_sub):
        hs = integrate(field, h0, times, jnp.zeros(1), mask, n_sub=n_sub,
                       method=method)
        return abs(float(hs[0, -1, 0]) - np.exp(-1.0))

    e1, e2 = err(subs[0]), err(subs[1])
    rate = np.log2(e1 / e2)
    assert rate == pytest.approx(order, abs=0.4)


def test_time_dependent_field():
    # dh/dt = t  ->  h(t) = h0 + t^2/2 (exact for midpoint, order 2)
    field = lambda t, h: jnp.broadcast_to(t[:, None], h.shape)
    h0 = jnp.zeros((2, 1))
    times = _grid(2, 5)
    hs = integrate(field, h0, times, jnp.zeros(2), jnp.ones((2, 5), bool),
                   n_sub=2, method="midpoint")
    np.testing.assert_allclose(np.asarray(hs[..., 0]),
                               np.asarray(times) ** 2 / 2, atol=1e-6)


def test_zero_width_first_interval_is_identity():
    # t_start == times[0]: the first step must leave the seed untouched
    # (reproduces the reference's single-point-at-T0 shortcut,
    # src/model.py:89-91).
    field = lambda t, h: 100.0 * jnp.ones_like(h)
    h0 = 7.0 * jnp.ones((3, 2))
    times = jnp.zeros((3, 1))
    hs = integrate(field, h0, times, jnp.zeros(3), jnp.ones((3, 1), bool),
                   n_sub=3)
    np.testing.assert_allclose(np.asarray(hs[:, 0]), 7.0)


def test_masked_prefix_starts_at_t_start():
    # Re-entry semantics: invalid prefix leaves the state at the seed and
    # integration starts from t_start, not from the grid origin.
    field = lambda t, h: -h
    l = 6
    times = _grid(1, l)
    mask = jnp.array([[False, False, False, True, True, True]])
    t_start = jnp.array([0.4])
    hs = integrate(field, jnp.ones((1, 1)), times, t_start, mask, n_sub=8,
                   method="rk4")
    t = np.asarray(times[0])
    # valid entries: exp(-(t - 0.4)); invalid entries: stale seed (=1)
    np.testing.assert_allclose(np.asarray(hs[0, :3, 0]), 1.0)
    np.testing.assert_allclose(np.asarray(hs[0, 3:, 0]),
                               np.exp(-(t[3:] - 0.4)), rtol=1e-5)


def test_masked_suffix_freezes_state():
    field = lambda t, h: -h
    times = _grid(1, 5)
    mask = jnp.array([[True, True, True, False, False]])
    hs = integrate(field, jnp.ones((1, 1)), times, jnp.zeros(1), mask,
                   n_sub=8, method="rk4")
    t = np.asarray(times[0])
    np.testing.assert_allclose(np.asarray(hs[0, :3, 0]), np.exp(-t[:3]),
                               rtol=1e-5)
    # frozen at the last valid value
    np.testing.assert_allclose(np.asarray(hs[0, 3:, 0]), np.exp(-t[2]),
                               rtol=1e-5)


def test_remat_matches_plain():
    field = lambda t, h: jnp.sin(h) - 0.3 * h
    h0 = jnp.linspace(0, 1, 6).reshape(3, 2)
    times = _grid(3, 7)
    mask = jnp.ones((3, 7), bool)
    a = integrate(field, h0, times, jnp.zeros(3), mask, n_sub=2)
    b = integrate(field, h0, times, jnp.zeros(3), mask, n_sub=2, remat=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


@pytest.mark.parametrize("method,tol", [
    ("bosh3", 5e-4), ("adaptive_heun", 2e-3), ("fehlberg2", 2e-3),
    ("dopri8", 1e-4), ("adams", 2e-3)])
def test_adaptive_method_surface(method, tol):
    # the remaining torchdiffeq adaptive names (src/model.py:103-106):
    # real embedded pairs, not aliases — each meets its requested
    # tolerance on the decay problem
    field = lambda t, h: -h
    h0 = jnp.ones((3, 2))
    times = _grid(3, 7)
    mask = jnp.ones((3, 7), bool)
    hs = integrate_adaptive(field, h0, times, jnp.zeros(3), mask,
                            rtol=1e-4, atol=1e-5, max_steps=32,
                            method=method)
    expect = np.broadcast_to(np.exp(-np.asarray(times))[:, :, None],
                             (3, 7, 2))
    np.testing.assert_allclose(np.asarray(hs), expect, atol=tol)


def test_implicit_adams_rejected_with_hint():
    # 'implicit_adams' is not a torchdiffeq-0.1.1 name (the reference's
    # pin); it must be rejected with a pointer at the two real Adams
    # solvers, never silently substituted
    from xnode_wan_tpu.config import SolverConfig
    with pytest.raises(ValueError, match="fixed_adams"):
        SolverConfig(dim=2, solver="implicit_adams")
    cfg = SolverConfig(dim=2, solver="adams")   # VCABM: accepted
    assert cfg.solver == "adams"


def test_adams_order_cap_warns():
    # Multistep history restarts at sample-interval seams, so n_sub caps
    # the effective Adams order — selecting AB4/ABM4 where it degenerates
    # (n_sub=1 explicit_adams IS euler) must warn, not stay silent.
    import warnings

    from xnode_wan_tpu.config import SolverConfig
    base = dict(dim=2, N_r=8, N_b=8, shape_param=(-1.0, 1.0))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        SolverConfig(solver="explicit_adams", N_t=50, min_steps=5, **base)
    assert len(w) == 1 and "capped at 1" in str(w[0].message)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        SolverConfig(solver="fixed_adams", N_t=4, min_steps=8, **base)
    assert not w  # n_sub=4 reaches the advertised order: silent


def test_dopri5_exact_decay():
    # Adaptive RK5(4) must hit the closed form well within tolerance.
    field = lambda t, h: -h
    h0 = jnp.ones((4, 3))
    times = _grid(4, 9)
    mask = jnp.ones((4, 9), bool)
    hs = integrate_adaptive(field, h0, times, jnp.zeros(4), mask,
                            rtol=1e-6, atol=1e-8, max_steps=16)
    expect = np.broadcast_to(np.exp(-np.asarray(times))[:, :, None],
                             (4, 9, 3))
    np.testing.assert_allclose(np.asarray(hs), expect, rtol=1e-5, atol=1e-6)


def test_dopri5_nonlinear_vs_fine_rk4():
    # Non-autonomous nonlinear field: adaptive answer matches a very fine
    # fixed-grid rk4 reference.
    field = lambda t, h: jnp.sin(3.0 * t)[:, None] * h - 0.5 * h ** 2
    h0 = jnp.full((2, 2), 0.8)
    times = _grid(2, 6)
    mask = jnp.ones((2, 6), bool)
    ref = integrate(field, h0, times, jnp.zeros(2), mask, n_sub=64,
                    method="rk4")
    got = integrate_adaptive(field, h0, times, jnp.zeros(2), mask,
                             rtol=1e-6, atol=1e-8, max_steps=24)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_dopri5_masking_and_t_start():
    # Same re-entry / frozen-suffix semantics as the fixed-step scan.
    field = lambda t, h: -h
    times = _grid(1, 6)
    mask = jnp.array([[False, False, True, True, False, False]])
    t_start = jnp.array([0.3])
    hs = integrate_adaptive(field, jnp.ones((1, 1)), times, t_start, mask,
                            rtol=1e-6, atol=1e-8)
    t = np.asarray(times[0])
    np.testing.assert_allclose(np.asarray(hs[0, :2, 0]), 1.0)
    np.testing.assert_allclose(np.asarray(hs[0, 2:4, 0]),
                               np.exp(-(t[2:4] - 0.3)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(hs[0, 4:, 0]),
                               np.exp(-(t[3] - 0.3)), rtol=1e-5)


def test_dopri5_gradients_and_remat():
    def loss(h0, remat):
        field = lambda t, h: -h
        hs = integrate_adaptive(field, h0, _grid(1, 4), jnp.zeros(1),
                                jnp.ones((1, 4), bool), rtol=1e-6,
                                atol=1e-8, remat=remat)
        return hs[0, -1, 0]

    g = jax.grad(loss)(jnp.ones((1, 1)), False)
    gr = jax.grad(loss)(jnp.ones((1, 1)), True)
    assert float(g[0, 0]) == pytest.approx(np.exp(-1.0), rel=1e-4)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), rtol=1e-6)


def test_gradients_flow_through_scan():
    def loss(h0):
        field = lambda t, h: -h
        hs = integrate(field, h0, _grid(1, 4), jnp.zeros(1),
                       jnp.ones((1, 4), bool), n_sub=4, method="rk4")
        return hs[0, -1, 0]

    g = jax.grad(loss)(jnp.ones((1, 1)))
    # d/dh0 [h0 * exp(-1)] = exp(-1)
    assert float(g[0, 0]) == pytest.approx(np.exp(-1.0), rel=1e-4)


def test_adaptive_strict_flags_budget_exhaustion():
    # torchdiffeq raises when max_num_steps is exceeded; our compiled
    # analogue NaN-poisons the exhausted interval under strict=True so the
    # tolerance violation is loud, and takes one forced (error-unchecked)
    # full-span step under strict=False.
    import jax.numpy as jnp
    from xnode_wan_tpu.ops.integrate import integrate_adaptive

    def stiff(t, h):  # fast-varying field: 1 attempt can't meet 1e-8
        return -80.0 * h + jnp.sin(40.0 * t)[:, None]

    h0 = jnp.ones((4, 3))
    times = jnp.tile(jnp.linspace(0.2, 1.0, 5)[None, :], (4, 1))
    t0 = jnp.zeros((4,))
    mask = jnp.ones_like(times, dtype=bool)
    soft = integrate_adaptive(stiff, h0, times, t0, mask,
                              rtol=1e-8, atol=1e-10, max_steps=1)
    hard = integrate_adaptive(stiff, h0, times, t0, mask,
                              rtol=1e-8, atol=1e-10, max_steps=1,
                              strict=True)
    assert bool(jnp.isfinite(soft).all())
    assert bool(jnp.isnan(hard).any())
    ok = integrate_adaptive(stiff, h0, times, t0, mask,
                            rtol=1e-3, atol=1e-4, max_steps=64,
                            strict=True)
    assert bool(jnp.isfinite(ok).all())


def test_dopri8_vendored_literals_match_scipy():
    # The DOP853 coefficients are vendored so the solver carries no
    # scipy dependency (scipy's table lives in a private module that may
    # move between releases); when scipy IS available, require the
    # vendored literals to be bit-exact against its published values.
    dc = pytest.importorskip("scipy.integrate._ivp.dop853_coefficients")
    from xnode_wan_tpu.ops.integrate import (_DOP853_A, _DOP853_B,
                                             _DOP853_C, _DOP853_E5)
    n = int(dc.N_STAGES)
    assert _DOP853_C == tuple(float(c) for c in dc.C[:n])
    assert _DOP853_A == tuple(
        tuple(float(a) for a in dc.A[i, :i]) for i in range(n))
    assert _DOP853_B == tuple(float(b) for b in dc.B)
    assert _DOP853_E5 == tuple(float(e) for e in dc.E5[:n])


def test_dopri8_tableau_consistency():
    # The 8th-order pair is Hairer's published DOP853 table (vendored),
    # not transcribed by hand — still, guard the assembly: weights are
    # order-1 consistent, rows sum to the nodes, and the embedded
    # difference (the error weights) sums to zero.
    from xnode_wan_tpu.ops.integrate import _tableau
    cs, rows, b_hi, b_lo, order = _tableau("dopri8")
    assert len(cs) == len(rows) == len(b_hi) == len(b_lo) == 12
    assert order == 6
    assert sum(b_hi) == pytest.approx(1.0, abs=1e-12)
    assert sum(b_lo) == pytest.approx(1.0, abs=1e-12)
    assert sum(bh - bl for bh, bl in zip(b_hi, b_lo)) == pytest.approx(
        0.0, abs=1e-12)
    for c, row in zip(cs, rows):
        assert sum(row) == pytest.approx(c, abs=1e-12)


def test_dopri8_nonlinear_vs_fine_rk4():
    # The high-order pair on the same non-autonomous nonlinear problem
    # as the dopri5 test, at the same tolerances.
    field = lambda t, h: jnp.sin(3.0 * t)[:, None] * h - 0.5 * h ** 2
    h0 = jnp.full((2, 2), 0.8)
    times = _grid(2, 6)
    mask = jnp.ones((2, 6), bool)
    ref = integrate(field, h0, times, jnp.zeros(2), mask, n_sub=64,
                    method="rk4")
    got = integrate_adaptive(field, h0, times, jnp.zeros(2), mask,
                             rtol=1e-6, atol=1e-8, max_steps=24,
                             method="dopri8")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


# --- adams (VCABM): torchdiffeq's adaptive-order multistep ------------------

def test_vcabm_gamma_star_recurrence_values():
    # gamma*_k from the generating-function recurrence must reproduce the
    # classical table (Hairer I.III.1)
    from xnode_wan_tpu.ops.integrate import _gamma_star
    gs = _gamma_star(7)
    expect = (1.0, -1 / 2, -1 / 12, -1 / 24, -19 / 720, -3 / 160,
              -863 / 60480)
    np.testing.assert_allclose(gs, expect, rtol=1e-14)


def test_adams_nonlinear_vs_fine_rk4():
    # Same non-autonomous nonlinear problem as the dopri5/dopri8 tests.
    # strict=True: the answer must be reached WITHIN the attempt budget
    # (no forced error-unchecked fallback steps hiding in the result).
    field = lambda t, h: jnp.sin(3.0 * t)[:, None] * h - 0.5 * h ** 2
    h0 = jnp.full((2, 2), 0.8)
    times = _grid(2, 6)
    mask = jnp.ones((2, 6), bool)
    ref = integrate(field, h0, times, jnp.zeros(2), mask, n_sub=64,
                    method="rk4")
    got = integrate_adaptive(field, h0, times, jnp.zeros(2), mask,
                             rtol=1e-6, atol=1e-8, max_steps=32,
                             strict=True, method="adams")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-5, atol=5e-6)


def test_adams_accuracy_scales_with_rtol():
    # The error controller is real: tightening rtol by 1e4 must shrink
    # the global error by well over 1e1. One [0, 1] output interval so
    # step size is tolerance-controlled, not clamped by sample spacing.
    field = lambda t, h: -h
    h0 = jnp.ones((2, 2))
    times = _grid(2, 2)
    mask = jnp.ones((2, 2), bool)

    def err(rtol):
        hs = integrate_adaptive(field, h0, times, jnp.zeros(2), mask,
                                rtol=rtol, atol=rtol * 1e-2,
                                max_steps=64, strict=True,
                                method="adams")
        return float(np.abs(np.asarray(hs[:, -1, :])
                            - np.exp(-1.0)).max())

    e_loose, e_tight = err(1e-2), err(1e-6)
    assert e_tight < e_loose / 10.0
    # per-step error control bounds the LOCAL error by ~rtol; the global
    # error accumulates over the ~15 accepted steps (measured 1.3e-5 in
    # both f32 and f64 — not a precision floor, the standard O(steps *
    # rtol) envelope of error-per-step controllers, torchdiffeq included)
    assert e_tight < 3e-5


def test_adams_order_adaptation_pays():
    # 6 attempts per interval at rtol=1e-6 is far beyond what order<=2
    # could deliver on dt ~ 0.02 (local error ~ 1e-4): meeting the
    # tolerance inside the budget under strict=True requires the order
    # controller to actually climb.
    field = lambda t, h: -h
    h0 = jnp.ones((1, 1))
    times = _grid(1, 9)
    mask = jnp.ones((1, 9), bool)
    hs = integrate_adaptive(field, h0, times, jnp.zeros(1), mask,
                            rtol=1e-6, atol=1e-8, max_steps=6,
                            strict=True, method="adams")
    assert bool(jnp.isfinite(hs).all())
    expect = np.exp(-np.asarray(times[0]))
    np.testing.assert_allclose(np.asarray(hs[0, :, 0]), expect,
                               rtol=1e-4)


def test_adams_masking_and_t_start():
    # Same re-entry / frozen-suffix semantics as the other integrators.
    field = lambda t, h: -h
    times = _grid(1, 6)
    mask = jnp.array([[False, False, True, True, False, False]])
    t_start = jnp.array([0.3])
    hs = integrate_adaptive(field, jnp.ones((1, 1)), times, t_start, mask,
                            rtol=1e-6, atol=1e-8, max_steps=32,
                            method="adams")
    t = np.asarray(times[0])
    np.testing.assert_allclose(np.asarray(hs[0, :2, 0]), 1.0)
    np.testing.assert_allclose(np.asarray(hs[0, 2:4, 0]),
                               np.exp(-(t[2:4] - 0.3)), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(hs[0, 4:, 0]),
                               np.exp(-(t[3] - 0.3)), rtol=1e-4)


def test_adams_gradients_and_remat():
    def loss(h0, remat):
        field = lambda t, h: -h
        hs = integrate_adaptive(field, h0, _grid(1, 4), jnp.zeros(1),
                                jnp.ones((1, 4), bool), rtol=1e-6,
                                atol=1e-8, max_steps=32, remat=remat,
                                method="adams")
        return hs[0, -1, 0]

    g = jax.grad(loss)(jnp.ones((1, 1)), False)
    gr = jax.grad(loss)(jnp.ones((1, 1)), True)
    assert float(g[0, 0]) == pytest.approx(np.exp(-1.0), rel=1e-4)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), rtol=1e-6)


def test_adams_strict_flags_budget_exhaustion():
    # Same exhaustion contract as the RK integrator: strict NaN-poisons,
    # soft takes a forced step (and restarts the multistep history).
    def stiff(t, h):
        return -80.0 * h + jnp.sin(40.0 * t)[:, None]

    h0 = jnp.ones((4, 3))
    times = jnp.tile(jnp.linspace(0.2, 1.0, 5)[None, :], (4, 1))
    t0 = jnp.zeros((4,))
    mask = jnp.ones_like(times, dtype=bool)
    soft = integrate_adaptive(stiff, h0, times, t0, mask,
                              rtol=1e-10, atol=1e-12, max_steps=1,
                              method="adams")
    hard = integrate_adaptive(stiff, h0, times, t0, mask,
                              rtol=1e-10, atol=1e-12, max_steps=1,
                              strict=True, method="adams")
    assert bool(jnp.isfinite(soft).all())
    assert bool(jnp.isnan(hard).any())
