"""Randomized-QMC (shifted scrambled Halton) interior sampling.

The feature is a pure estimator-variance reduction on the Hypercube's
interior cloud (ops/qmc.py); these tests pin determinism, unbiasedness,
the actual variance win, and the config plumbing/guards.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xnode_wan_tpu.config import SolverConfig
from xnode_wan_tpu.ops.qmc import halton_base, qmc_uniform
from xnode_wan_tpu.ops.sampling import make_domain


def test_halton_base_deterministic_and_in_range():
    a = halton_base(512, 7)
    b = halton_base(512, 7)
    assert a.shape == (512, 7)
    np.testing.assert_array_equal(a, b)
    assert a.min() >= 0.0 and a.max() < 1.0
    # low-discrepancy: each 1-D marginal is far more even than iid uniform
    # (the max gap between sorted samples of 512 Halton points is O(1/n))
    for j in range(7):
        col = np.sort(a[:, j])
        gaps = np.diff(np.concatenate([[0.0], col, [1.0]]))
        assert gaps.max() < 20.0 / 512

def test_qmc_uniform_key_semantics():
    f = jax.jit(lambda k: qmc_uniform(k, 256, 5, jnp.float32,
                                      minval=-1.0, maxval=1.0))
    x1 = f(jax.random.PRNGKey(0))
    x2 = f(jax.random.PRNGKey(0))
    x3 = f(jax.random.PRNGKey(1))
    assert x1.shape == (256, 5)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    assert not np.allclose(np.asarray(x1), np.asarray(x3))
    assert float(x1.min()) >= -1.0 and float(x1.max()) < 1.0


def test_shifted_halton_is_unbiased_and_lower_variance():
    """E[f] estimates agree with the exact integral; the spread over
    independent randomizations is much smaller than iid MC's."""
    n, d, reps = 1024, 5, 32
    exact = d / 3.0  # int_[0,1]^d sum x_i^2

    def f_mean(x):
        return float(jnp.sum(x ** 2, axis=1).mean())

    qmc_vals = [f_mean(qmc_uniform(jax.random.PRNGKey(i), n, d, jnp.float32))
                for i in range(reps)]
    iid_vals = [f_mean(jax.random.uniform(jax.random.PRNGKey(i), (n, d)))
                for i in range(reps)]
    assert abs(np.mean(qmc_vals) - exact) < 3 * np.std(iid_vals)
    # the variance win is the whole point: require at least 3x std reduction
    # (measured ~20x at these sizes; 3x leaves seed headroom)
    assert np.std(qmc_vals) < np.std(iid_vals) / 3.0


def test_hypercube_interior_qmc_batch():
    dom = make_domain("Hypercube", (-1.0, 1.0), 5, 0.0, 1.0, 10, qmc="halton")
    batch = jax.jit(lambda k: dom.interior(k, 128))(jax.random.PRNGKey(3))
    assert batch.x.shape == (128, 10, 6)
    assert bool(batch.mask.all())
    xs = np.asarray(batch.space)
    assert xs.min() >= -1.0 and xs.max() < 1.0
    # spatial points are constant along the path (time-independent domain)
    np.testing.assert_array_equal(xs[:, 0, :], xs[:, 5, :])
    # fresh key -> fresh shift
    batch2 = jax.jit(lambda k: dom.interior(k, 128))(jax.random.PRNGKey(4))
    assert not np.allclose(np.asarray(batch2.space), xs)


def test_hypercube_boundary_qmc_batch():
    """Boundary cloud under qmc=halton: the pinned face coordinate is
    exact, the free coordinates keep their low discrepancy per face."""
    d = 3
    dom = make_domain("Hypercube", (-1.0, 1.0), d, 0.0, 1.0, 8, qmc="halton")
    n_b = 2 * d * 64  # 64 rows per face
    batch = jax.jit(lambda k: dom.boundary(k, n_b))(jax.random.PRNGKey(7))
    xs = np.asarray(batch.space[:, 0, :])
    # contiguous-block face assignment (see Hypercube.boundary: round-robin
    # striding destroys the per-face halton marginals)
    face = (np.arange(n_b) * (2 * d)) // n_b
    axis = face // 2
    val = np.where(face % 2 == 0, 1.0, -1.0)
    np.testing.assert_allclose(xs[np.arange(n_b), axis], val)
    # exactly balanced face counts
    np.testing.assert_array_equal(np.bincount(face), np.full(2 * d, 64))
    # free coordinates: per-face 1-D marginals are much more even than the
    # iid expectation (~log n / n); measured max gap ~0.03*2 on [-1,1]
    for f in range(2 * d):
        rows = xs[face == f]
        for j in range(d):
            if j == f // 2:
                continue
            col = np.sort(rows[:, j])
            gaps = np.diff(np.concatenate([[-1.0], col, [1.0]]))
            assert gaps.max() < 2.0 * 8.0 / len(rows)
    # fresh key -> fresh shift
    b2 = jax.jit(lambda k: dom.boundary(k, n_b))(jax.random.PRNGKey(8))
    assert not np.allclose(np.asarray(b2.space), np.asarray(batch.space))


def test_qmc_guards():
    with pytest.raises(ValueError, match="qmc"):
        SolverConfig(qmc="sobolev")
    # all three domains accept the option (moving domains map the base set
    # through their smooth monotone inverse CDFs)
    for name, shape in (("Hypercube", (-1.0, 1.0)), ("NSphere_TCone", 1.0),
                        ("NSphere_THourglass", 1.0)):
        dom = make_domain(name, shape, 3, 0.0, 1.0, 8, qmc="halton")
        assert dom.qmc == "halton"


def test_qmc_ball_unbiased_and_lower_variance():
    """RQMC ball cloud: correct support, unbiased E[|x|^2] = r^2 d/(d+2),
    and the spread over independent randomizations beats i.i.d. sampling
    (the radial coordinate is one monotone map of one Halton column)."""
    from xnode_wan_tpu.ops.qmc import qmc_ball
    from xnode_wan_tpu.ops.sampling import _ball

    n, d, r, reps = 1024, 3, 2.0, 32
    exact = r * r * d / (d + 2)

    def rho2_mean(x):
        return float(jnp.sum(x ** 2, axis=1).mean())

    qmc_vals, iid_vals = [], []
    for i in range(reps):
        k = jax.random.PRNGKey(i)
        q = qmc_ball(k, n, d, r, jnp.float32)
        assert float(jnp.linalg.norm(q, axis=1).max()) <= r * (1 + 1e-6)
        qmc_vals.append(rho2_mean(q))
        iid_vals.append(rho2_mean(_ball(k, n, d, r, dtype=jnp.float32)))
    assert abs(np.mean(qmc_vals) - exact) < 3 * np.std(iid_vals)
    assert np.std(qmc_vals) < np.std(iid_vals) / 3.0
    # determinism under a fixed key
    q2 = qmc_ball(jax.random.PRNGKey(0), n, d, r, jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(qmc_ball(jax.random.PRNGKey(0), n, d, r, jnp.float32)),
        np.asarray(q2))


def test_cone_interior_qmc():
    from xnode_wan_tpu.ops.sampling import NSphereTCone

    dom = NSphereTCone(1.0, 3, 0.0, 1.0, 8, qmc="halton")
    batch = jax.jit(lambda k: dom.interior(k, 128))(jax.random.PRNGKey(5))
    xs = np.asarray(batch.space[:, 0, :])
    rho = np.linalg.norm(xs, axis=-1)
    assert rho.max() <= 1.0 + 1e-6
    # mask law unchanged: alive while t < 1 - |x| (row 0 always alive)
    times = np.asarray(batch.x[0, :, 0])
    expect = times[None, :] < (1.0 - rho)[:, None]
    expect[:, 0] = True
    np.testing.assert_array_equal(np.asarray(batch.mask), expect)
    # fresh key -> fresh shift
    b2 = jax.jit(lambda k: dom.interior(k, 128))(jax.random.PRNGKey(6))
    assert not np.allclose(np.asarray(b2.space), np.asarray(batch.space))


def test_cone_boundary_qmc():
    """Boundary cloud under qmc=halton: points lie exactly on the moving
    boundary |x| = r(1-t), and the time marginal keeps the 1-D low
    discrepancy (the inverse CDF is monotone, so mapping the empirical t's
    back through the forward CDF must recover an even set)."""
    from xnode_wan_tpu.ops.sampling import NSphereTCone

    d, n_b = 3, 512
    dom = NSphereTCone(1.0, d, 0.0, 1.0, 8, path_boundary=False, qmc="halton")
    batch = jax.jit(lambda k: dom.boundary(k, n_b))(jax.random.PRNGKey(9))
    t = np.asarray(batch.x[:, 0, 0])
    xs = np.asarray(batch.x[:, 0, 1:])
    np.testing.assert_allclose(np.linalg.norm(xs, axis=-1), 1.0 - t,
                               rtol=0, atol=1e-5)
    d1 = d + 1
    u = (1.0 - (1.0 - t) ** d1)  # forward CDF (T0=0, T=1: hi=1, lo=0)
    gaps = np.diff(np.concatenate([[0.0], np.sort(u), [1.0]]))
    assert gaps.max() < 20.0 / n_b
    b2 = jax.jit(lambda k: dom.boundary(k, n_b))(jax.random.PRNGKey(10))
    assert not np.allclose(np.asarray(b2.x), np.asarray(batch.x))


def test_hourglass_qmc():
    from xnode_wan_tpu.ops.sampling import NSphereTHourglass

    d = 3
    dom = NSphereTHourglass(1.0, d, 0.0, 1.0, 8, path_boundary=False,
                            qmc="halton")
    # boundary points sit exactly on the piecewise radius law
    batch = jax.jit(lambda k: dom.boundary(k, 256))(jax.random.PRNGKey(11))
    t = np.asarray(batch.x[:, 0, 0])
    xs = np.asarray(batch.x[:, 0, 1:])
    np.testing.assert_allclose(np.linalg.norm(xs, axis=-1),
                               np.asarray(dom.radius_at(jnp.asarray(t))),
                               rtol=0, atol=1e-5)
    # both branches of the piecewise CDF are hit
    assert (t < 0.5).any() and (t > 0.5).any()
    # interior: support and the 2*N_r two-segment layout are unchanged
    ib = jax.jit(lambda k: dom.interior(k, 64))(jax.random.PRNGKey(12))
    assert ib.x.shape[0] == 128
    rho = np.linalg.norm(np.asarray(ib.space[:, 0, :]), axis=-1)
    assert rho.max() <= 1.0 + 1e-6


def test_qmc_cone_training_step_runs():
    """One real outer step on the moving domain with qmc=halton."""
    from xnode_wan_tpu.problems import load_problem
    from xnode_wan_tpu.training import NODEWANSolver

    cfg = SolverConfig(dim=3, N_t=6, N_r=64, N_b=64, iterations=2,
                       u_layers=2, v_layers=2, min_steps=2, qmc="halton",
                       domain="NSphere_TCone", shape_param=1.0)
    problem = load_problem("Ex4_1_funcs", dim=3)
    solver = NODEWANSolver(cfg, problem, work_dir="/tmp/qmc_cone_smoke")
    hist = solver.train(iterations=2)
    assert np.isfinite(hist["loss_u"]).all()


def test_qmc_training_step_runs():
    """One real outer step with qmc=halton (CPU): finite loss, state advances."""
    from xnode_wan_tpu.problems import load_problem
    from xnode_wan_tpu.training import NODEWANSolver

    cfg = SolverConfig(dim=3, N_t=6, N_r=64, N_b=64, iterations=2,
                       u_layers=2, v_layers=2, min_steps=2, qmc="halton")
    problem = load_problem("Ex4_1_funcs", dim=3)
    solver = NODEWANSolver(cfg, problem, work_dir="/tmp/qmc_smoke")
    hist = solver.train(iterations=2)
    assert np.isfinite(hist["loss_u"]).all()
