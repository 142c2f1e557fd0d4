"""Property tests for domain samplers (SURVEY §4's implied test plan:
volume/containment/boundary-membership, func_w sign, grid-gap invariant)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xnode_wan_tpu.ops.sampling import (
    Hypercube, NSphereTCone, NSphereTHourglass, make_domain, stratified_times)


def test_stratified_times_gap_invariant(key):
    # Max gap <= 2*(T-T0)/N_t — the static replacement for fillt
    # (reference src/dataset.py:13-32).
    for seed in range(5):
        t = stratified_times(jax.random.PRNGKey(seed), 0.0, 1.0, 20)
        t = np.asarray(t)
        assert t[0] == 0.0 and t[-1] == 1.0
        assert np.all(np.diff(t) >= 0)
        assert np.max(np.diff(t)) <= 2.0 / 20 + 1e-6


def test_stratified_times_custom_span(key):
    t = np.asarray(stratified_times(key, 0.5, 2.5, 16))
    assert t[0] == 0.5 and t[-1] == 2.5
    assert np.max(np.diff(t)) <= 2 * 2.0 / 16 + 1e-6


@pytest.fixture
def cube():
    return Hypercube((-1.0, 1.0), dim=3, T0=0.0, T=1.0, N_t=10)


def test_cube_interior(cube, key):
    b = cube.interior(key, 64)
    assert b.x.shape == (64, 10, 4)
    assert bool(b.mask.all())
    xs = np.asarray(b.space)
    assert xs.min() >= -1.0 and xs.max() <= 1.0
    # spatial coords constant along the path
    assert np.allclose(xs, xs[:, :1, :])
    # shared sorted grid with endpoints pinned
    ts = np.asarray(b.times)
    assert np.allclose(ts, ts[0])
    assert ts[0, 0] == 0.0 and ts[0, -1] == 1.0
    assert bool(b.seed_from_h.all())


def test_cube_boundary_on_faces(cube, key):
    b = cube.boundary(key, 60)
    xs = np.asarray(b.space)
    on_face = np.isclose(np.abs(xs), 1.0).any(axis=-1)
    assert on_face.all()
    w = np.asarray(cube.func_w(b.x))
    assert np.allclose(w, 0.0, atol=1e-6)


def test_cube_func_w_interior_positive(cube, key):
    b = cube.interior(key, 128)
    w = np.asarray(cube.func_w(b.x))
    assert (w > 0).all()


def test_cube_volume(cube):
    assert cube.V() == pytest.approx(2.0 ** 3 * 1.0)


@pytest.fixture
def cone():
    return NSphereTCone(1.0, dim=3, T0=0.0, T=1.0, N_t=12)


def test_cone_interior_mask_matches_geometry(cone, key):
    b = cone.interior(key, 256)
    w = np.asarray(cone.func_w(b.x))
    m = np.asarray(b.mask)
    # valid samples are strictly inside; invalid ones outside (or boundary)
    assert (w[m] > 0).all()
    assert (w[~m] <= 1e-5).all()
    assert m[:, 0].all()


def test_cone_volume_monte_carlo(cone, key):
    # MC estimate of the space-time volume vs the analytic V().
    n = 40000
    k1, k2 = jax.random.split(key)
    x = jax.random.uniform(k1, (n, 3), minval=-1.0, maxval=1.0)
    t = jax.random.uniform(k2, (n,))
    inside = jnp.linalg.norm(x, axis=-1) < 1.0 * (1.0 - t)
    est = float(inside.mean()) * 2.0 ** 3
    assert est == pytest.approx(cone.V(), rel=0.05)


def test_cone_boundary_on_surface(cone, key):
    import dataclasses
    pts = dataclasses.replace(cone, path_boundary=False)
    b = pts.boundary(key, 512)
    assert b.x.shape == (512, 1, 4)
    w = np.asarray(pts.func_w(b.x))
    assert np.allclose(w, 0.0, atol=1e-5)
    t = np.asarray(b.times[:, 0])
    assert (t >= 0).all() and (t <= 1).all()
    # density ∝ (1-t)^d: mean of t should match analytic 1/(d+2) shift
    # E[t] for density (d+1)(1-t)^d on [0,1] is 1/(d+2)
    assert t.mean() == pytest.approx(1.0 / (3 + 2), abs=0.02)
    assert not bool(b.seed_from_h.any())


def test_cone_boundary_paths(cone, key):
    # default mode: paths from T0 whose FINAL sample lies on the boundary
    assert cone.boundary_at_exit
    b = cone.boundary(key, 128)
    assert b.x.shape == (128, cone.N_t, 4)
    w_last = np.asarray(cone.func_w(b.x[:, -1, :]))
    assert np.allclose(w_last, 0.0, atol=1e-5)
    w_inner = np.asarray(cone.func_w(b.x[:, :-1, :]))
    assert (w_inner >= -1e-6).all()  # history stays inside (or on) the domain
    assert bool(b.seed_from_h.all())
    assert np.allclose(np.asarray(b.t_start), 0.0)
    ts = np.asarray(b.times)
    assert (np.diff(ts, axis=1) >= -1e-7).all()


@pytest.fixture
def hourglass():
    return NSphereTHourglass(1.0, dim=2, T0=0.0, T=1.0, N_t=16)


def test_hourglass_masks(hourglass, key):
    n_r = 200
    b = hourglass.interior(key, n_r)
    assert b.x.shape == (2 * n_r, 16, 3)
    m = np.asarray(b.mask)
    w = np.asarray(hourglass.func_w(b.x))
    # every valid sample is geometrically inside
    assert (w[m] > -1e-6).all()
    # segment-A rows valid at T0; segment-B rows start from g-seed
    assert m[:n_r, 0].all()
    seed = np.asarray(b.seed_from_h)
    assert seed[:n_r].all() and not seed[n_r:].any()
    # B rows: start time equals |x|/r and masked times all exceed it
    rho = np.linalg.norm(np.asarray(b.space[n_r:, 0, :]), axis=-1)
    ts = np.asarray(b.t_start[n_r:])
    assert np.allclose(ts, rho, atol=1e-6)
    times = np.asarray(b.times[n_r:])
    mb = m[n_r:]
    assert (times[mb] > np.broadcast_to(ts[:, None], times.shape)[mb]).all()
    # rows that never exit have an all-dead B row
    never = rho <= 0.5
    assert (~mb[never]).all()


def test_hourglass_volume_monte_carlo(hourglass, key):
    n = 40000
    k1, k2 = jax.random.split(key)
    x = jax.random.uniform(k1, (n, 2), minval=-1.0, maxval=1.0)
    t = jax.random.uniform(k2, (n,))
    r_at = jnp.where(t <= 0.5, 1.0 - t, t)
    inside = jnp.linalg.norm(x, axis=-1) < r_at
    est = float(inside.mean()) * 2.0 ** 2
    assert est == pytest.approx(hourglass.V(), rel=0.05)


def test_hourglass_boundary(hourglass, key):
    import dataclasses
    pts = dataclasses.replace(hourglass, path_boundary=False)
    b = pts.boundary(key, 512)
    w = np.asarray(pts.func_w(b.x))
    assert np.allclose(w, 0.0, atol=1e-5)


def test_hourglass_boundary_paths(hourglass, key):
    b = hourglass.boundary(key, 128)
    assert b.x.shape == (128, hourglass.N_t, 3)
    # final sample lies on the boundary at its OWN sampled time (honest
    # late-time supervision): func_w = 0 there
    w_last = np.asarray(hourglass.func_w(b.x[:, -1, :]))
    assert np.allclose(w_last, 0.0, atol=1e-5)
    # descending-branch points: h-seeded from T0; ascending-branch points:
    # g-seeded at their re-entry anchor |x|/r = t (zero-width path)
    t_last = np.asarray(b.times[:, -1])
    asc = t_last > hourglass.mid + 1e-9
    seed = np.asarray(b.seed_from_h)
    ts = np.asarray(b.t_start)
    assert (~seed[asc]).all() and seed[~asc].all()
    assert np.allclose(ts[~asc], 0.0)
    rho = np.linalg.norm(np.asarray(b.space[:, 0, :]), axis=-1)
    assert np.allclose(ts[asc], rho[asc] / hourglass.r, atol=1e-6)
    # ascending times exist past the waist now (round-1 capped them)
    assert asc.any() and (t_last[asc] > hourglass.mid).all()


def test_hourglass_boundary_waist_cap_ablation(hourglass, key):
    import dataclasses
    capped = dataclasses.replace(hourglass, waist_cap=True)
    b = capped.boundary(key, 128)
    # round-1 behavior: every supervised time is at or before the waist
    assert (np.asarray(b.times[:, -1]) <= hourglass.mid + 1e-6).all()
    w_last = np.asarray(hourglass.func_w(b.x[:, -1, :]))
    assert np.allclose(w_last, 0.0, atol=1e-5)


def test_make_domain_registry():
    d = make_domain("Hypercube", [-1, 1], 5, 0.0, 1.0, 20)
    assert isinstance(d, Hypercube)
    d = make_domain("NSphere_TCone", 1.0, 3, 0.0, 1.0, 10)
    assert isinstance(d, NSphereTCone)
    d = make_domain("NSphere_THourglass", 1.0, 3, 0.0, 1.0, 10)
    assert isinstance(d, NSphereTHourglass)
    with pytest.raises(KeyError):
        make_domain("Nope", 1.0, 3, 0.0, 1.0, 10)


def test_samplers_are_jittable(cube, key):
    jitted = jax.jit(lambda k: cube.interior(k, 32))
    b = jitted(key)
    assert b.x.shape == (32, 10, 4)


def test_moving_domains_reject_nonzero_T0():
    # Radius laws / masks / V() of the moving domains are written against
    # absolute time with the reference's implicit T0 = 0; a nonzero T0
    # must be rejected, not silently corrupt geometry.
    for name in ("NSphere_TCone", "NSphere_THourglass"):
        with pytest.raises(ValueError, match="T0"):
            make_domain(name, 1.0, 3, 0.3, 1.0, 10)
        make_domain(name, 1.0, 3, 0.0, 1.0, 10)  # T0=0 still fine
