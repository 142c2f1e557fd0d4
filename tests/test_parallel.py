"""Multi-device tests on the 8-way virtual CPU mesh (the stand-in for a TPU
slice; SURVEY §4). Sharded and single-device training must agree."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xnode_wan_tpu.config import SolverConfig
from xnode_wan_tpu.parallel.mesh import make_mesh, round_up
from xnode_wan_tpu.problems import load_problem
from xnode_wan_tpu.training import NODEWANSolver

# Under XNODE_TEST_TPU=1 the suite runs on the real accelerator, which may
# be a single chip — these tests need the 8-device mesh.
if len(jax.devices()) < 8:
    pytest.skip("needs 8 devices (virtual CPU mesh or a TPU slice)",
                allow_module_level=True)

CFG = SolverConfig(dim=2, N_t=6, N_r=64, N_b=64, u_hidden_dim=8,
                   u_hidden_hidden_dim=8, u_layers=2, v_layers=3,
                   v_hidden_dim=12, iterations=5, alpha=1e4,
                   shape_param=(-1.0, 1.0), min_steps=3, seed=7)


def test_virtual_mesh_available():
    assert len(jax.devices()) >= 8


def test_round_up():
    assert round_up(4000, 8) == 4000
    assert round_up(4001, 8) == 4008
    assert round_up(1, 8) == 8


def test_sharded_matches_single_device(tmp_path, problem=None):
    """Full 20-iteration trajectory agreement, not just the final scalar:
    a subtle reduction/sharding drift compounds over iterations, so every
    per-iteration (loss_u, rel_err) must match to reduction-order noise."""
    problem = load_problem("cube_pde", dim=2)
    single = NODEWANSolver(CFG, problem, work_dir=str(tmp_path / "s"),
                           devices=jax.devices()[:1])
    assert single.mesh is None
    h1 = single.train_until(1e-9, 20, window=20)

    mesh = make_mesh(jax.devices())
    sharded = NODEWANSolver(CFG, problem, work_dir=str(tmp_path / "m"),
                            mesh=mesh)
    assert sharded.mesh.size == 8
    h8 = sharded.train_until(1e-9, 20, window=20)

    assert h8["iterations_run"] == h1["iterations_run"] == 20
    for name in ("loss_u", "rel_err"):
        np.testing.assert_allclose(np.asarray(h8[name]),
                                   np.asarray(h1[name]),
                                   rtol=2e-4, atol=1e-8, err_msg=name)


def test_batch_actually_sharded():
    problem = load_problem("cube_pde", dim=2)
    mesh = make_mesh(jax.devices())
    solver = NODEWANSolver(CFG, problem, mesh=mesh, work_dir="/tmp/shardchk")

    batch, _, _ = jax.jit(solver._sample)(jax.random.PRNGKey(0))
    shardings = batch.x.sharding
    # the path axis is split over all 8 devices
    assert len(shardings.device_set) == 8


def test_2d_mesh_tangent_parallel(tmp_path):
    """4x2 (data x tangent) mesh: trajectory matches the 1-D mesh."""
    from xnode_wan_tpu.parallel.mesh import make_mesh_2d
    problem = load_problem("cube_pde", dim=2)
    cfg = CFG.replace(iterations=3, tangent_shards=2)
    mesh = make_mesh_2d(jax.devices(), tangent_shards=2)
    assert mesh.shape == {"data": 4, "tangent": 2}
    s2d = NODEWANSolver(cfg, problem, work_dir=str(tmp_path / "2d"),
                        mesh=mesh)
    m2 = s2d.train(report=False)
    s1d = NODEWANSolver(CFG.replace(iterations=3), problem,
                        work_dir=str(tmp_path / "1d"),
                        devices=jax.devices()[:1])
    m1 = s1d.train(report=False)
    assert m2["loss_u"] == pytest.approx(m1["loss_u"], rel=1e-3)


def test_ensemble_composes_with_data_parallel(tmp_path):
    """ensemble=4 on 8 devices: member x data (4x2) mesh, BOTH axes used
    (round-2 VERDICT item 3 — no silent single-chip fallback)."""
    problem = load_problem("cube_pde", dim=2)
    cfg = CFG.replace(ensemble=4, iterations=3, N_r=32, N_b=32)
    s = NODEWANSolver(cfg, problem, work_dir=str(tmp_path / "e"),
                      mesh=make_mesh(jax.devices()))
    assert s.mesh is not None and s.mesh.shape == {"member": 4, "data": 2}
    m8 = s.train(report=False)
    assert np.isfinite(m8["loss_u"])
    # the stacked member states really span all 8 devices
    leaf = jax.tree.leaves(s.state.u_params)[0]
    assert len(leaf.sharding.device_set) >= 4
    # the per-member path batch is sharded over the data axis too:
    # run one jitted step and check an intermediate via the state sharding
    # (member axis) plus trajectory agreement with the unsharded run below.
    s1 = NODEWANSolver(cfg, problem, work_dir=str(tmp_path / "e1"),
                       devices=jax.devices()[:1])
    assert s1.mesh is None
    m1 = s1.train(report=False)
    assert m8["loss_u"] == pytest.approx(m1["loss_u"], rel=1e-3)
    assert m8["rel_err"] == pytest.approx(m1["rel_err"], rel=1e-3)


def test_ensemble_impossible_layout_raises(tmp_path):
    problem = load_problem("cube_pde", dim=2)
    cfg = CFG.replace(ensemble=3, iterations=1)
    with pytest.raises(ValueError, match="refusing"):
        NODEWANSolver(cfg, problem, work_dir=str(tmp_path),
                      mesh=make_mesh(jax.devices()))


def test_ensemble_member_only_mesh(tmp_path):
    """K a multiple of the device count: member-only mesh, 2 members/chip."""
    problem = load_problem("cube_pde", dim=2)
    cfg = CFG.replace(ensemble=16, iterations=2, N_r=16, N_b=16)
    s = NODEWANSolver(cfg, problem, work_dir=str(tmp_path),
                      mesh=make_mesh(jax.devices()))
    assert s.mesh.shape == {"member": 8}
    m = s.train(report=False)
    assert np.isfinite(m["loss_u"])


def test_odd_batch_rounded_to_shards():
    problem = load_problem("cube_pde", dim=2)
    mesh = make_mesh(jax.devices())
    solver = NODEWANSolver(CFG.replace(N_r=61, N_b=63), problem, mesh=mesh,
                           work_dir="/tmp/shardrnd")
    assert solver.cfg.N_r % 8 == 0 and solver.cfg.N_b % 8 == 0


def test_predict_sharded_matches_single(tmp_path):
    """Data-parallel serving: predict() under the data mesh returns the
    single-device values (pointwise eval — no collectives), including an
    uneven point count (13 over 8 shards)."""
    problem = load_problem("cube_pde", dim=2)
    single = NODEWANSolver(CFG, problem, work_dir=str(tmp_path / "s"),
                           devices=jax.devices()[:1])
    sharded = NODEWANSolver(CFG, problem, work_dir=str(tmp_path / "m"),
                            mesh=make_mesh(jax.devices()))
    pts = jax.random.uniform(jax.random.PRNGKey(3), (13, 3),
                             minval=-0.8, maxval=0.8)
    pts = pts.at[:, 0].set(jnp.abs(pts[:, 0]))
    u1 = np.asarray(single.predict(pts))
    u8 = np.asarray(sharded.predict(pts))
    np.testing.assert_allclose(u8, u1, rtol=1e-6, atol=1e-7)


def test_predict_member_only_mesh_runs(tmp_path):
    """A member-only ensemble mesh collapses to a flat data mesh for
    serving (pure map — every device serves a point shard)."""
    problem = load_problem("cube_pde", dim=2)
    cfg = CFG.replace(ensemble=16, N_r=16, N_b=16)
    s = NODEWANSolver(cfg, problem, work_dir=str(tmp_path),
                      mesh=make_mesh(jax.devices()))
    pts = jnp.array([[0.2, 0.1, -0.3], [0.5, 0.4, 0.2]])
    assert np.isfinite(np.asarray(s.predict(pts))).all()


def test_predict_multi_axis_mesh_collapses(tmp_path):
    """Serving under a data x tangent training mesh: evaluate_points must
    collapse the 4x2 mesh to a flat 8-way data mesh (all devices serve a
    point shard — no silent replication over the tangent axis) and match
    the single-device values."""
    from xnode_wan_tpu.parallel.mesh import make_mesh_2d
    problem = load_problem("cube_pde", dim=2)
    cfg = CFG.replace(tangent_shards=2)
    single = NODEWANSolver(CFG, problem, work_dir=str(tmp_path / "s"),
                           devices=jax.devices()[:1])
    mesh = make_mesh_2d(jax.devices(), tangent_shards=2)
    sharded = NODEWANSolver(cfg, problem, work_dir=str(tmp_path / "t"),
                            mesh=mesh)
    pts = jax.random.uniform(jax.random.PRNGKey(5), (13, 3),
                             minval=-0.8, maxval=0.8)
    pts = pts.at[:, 0].set(jnp.abs(pts[:, 0]))
    u1 = np.asarray(single.predict(pts))
    u8 = np.asarray(sharded.predict(pts))
    np.testing.assert_allclose(u8, u1, rtol=1e-6, atol=1e-7)
