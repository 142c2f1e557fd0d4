"""Same-weights parity against the REAL reference (round-2 VERDICT item 6).

Loads the reference solver's trained d=5 checkpoint
(``benchmarks/ref_run_nr4000/best_model_weights_NODE.pth``, produced by
``benchmarks/run_reference.py`` executing ``/root/reference`` verbatim)
into BOTH implementations and asserts f64 forward agreement on a shared
batch — the strongest possible architecture-parity evidence: any
divergence in lift/field/readout wiring, input ordering, seeding, or
integration would show up as a numeric mismatch.

Grid choice removes the one legitimate numerical difference: with a
uniform time grid of gap <= (T-T0)/min_steps starting at T0, the
reference's ``fillt`` densification is the identity and its single
midpoint step per interval equals this package's ``n_sub = 1`` scan step.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(REPO, "benchmarks", "ref_run_nr4000",
                    "best_model_weights_NODE.pth")


@pytest.mark.skipif(not os.path.exists(CKPT),
                    reason="reference checkpoint artifact not present")
def test_same_weights_forward_agreement():
    torch = pytest.importorskip("torch")
    from xnode_wan_tpu.config import SolverConfig
    from xnode_wan_tpu.models.xnode import apply_xnode
    from xnode_wan_tpu.ops.sampling import PathBatch
    from xnode_wan_tpu.utils.torch_compat import load_reference_state_dict

    jax.config.update("jax_enable_x64", True)
    try:
        # d=5 paper architecture (configs/cube_pde.yaml); N_t=21 uniform
        # grid -> gap 0.05 <= 0.2 = (T-T0)/min_steps (fillt identity) and
        # n_sub == 1 (single midpoint step per interval, like torchdiffeq).
        cfg = SolverConfig(dim=5, N_t=21, N_r=64, N_b=8, min_steps=5,
                           x64=True)
        assert cfg.n_sub == 1
        params = load_reference_state_dict(CKPT)

        rng = np.random.RandomState(0)
        n, l, d = 64, 21, 5
        xs = rng.uniform(-1.0, 1.0, size=(n, d))
        times = np.linspace(0.0, 1.0, l)
        x = np.concatenate(
            [np.broadcast_to(times[None, :, None], (n, l, 1)),
             np.broadcast_to(xs[:, None, :], (n, l, d))], axis=-1)
        batch = PathBatch(
            x=jnp.asarray(x, jnp.float64),
            mask=jnp.ones((n, l), dtype=bool),
            t_start=jnp.zeros((n,), jnp.float64),
            seed_from_h=jnp.ones((n,), dtype=bool),
        )

        from xnode_wan_tpu.problems import load_problem
        problem = load_problem("Ex4_1_funcs", dim=5)
        ours = np.asarray(apply_xnode(params, batch, problem, cfg))

        # --- reference forward, verbatim imports + vendored odeint -------
        sys.path.insert(0, os.path.join(REPO, "benchmarks"))
        import vendored_odeint
        sys.modules.setdefault("torchdiffeq", vendored_odeint)
        sys.path.insert(0, "/root/reference")
        from src.model import NeuralODE                    # noqa: E402
        from src.dataset import Hypercube                  # noqa: E402
        from configs import Ex4_1_funcs as funcs           # noqa: E402

        setup = {"dim": 5, "N_t": l, "N_r": n, "N_b": 8,
                 "T0": 0.0, "T": 1.0, "shape_param": [-1, 1]}
        domain = Hypercube([-1, 1], 5, 0.0, 1.0, l)
        net = NeuralODE(20, 1, funcs.func_h, funcs.func_g, setup, 10, 8,
                        domain, solver="midpoint", min_steps=5)
        sd = torch.load(CKPT, map_location="cpu", weights_only=True)
        net.load_state_dict(
            {k.removeprefix("module."): v for k, v in sd.items()})
        with torch.no_grad():
            theirs = net(torch.tensor(x, dtype=torch.float64))
        theirs = theirs.squeeze(-1).numpy()

        np.testing.assert_allclose(ours, theirs, atol=1e-9, rtol=1e-9)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_yaml_exponent_strings_coerced():
    # PyYAML 1.1 parses unsigned-exponent floats ("9.5e-1") as STRINGS;
    # every float/int field must coerce them in __post_init__ instead of
    # crashing later (validation TypeError or mid-run comparison).
    from xnode_wan_tpu.config import SolverConfig

    cfg = SolverConfig(dim=2, N_t=8, N_r="6.4e1", N_b=64, min_steps=4,
                       shape_param=(-1.0, 1.0),
                       alpha="1.0e4", ema_decay="9.0e-1",
                       window_target_s="1.2e2", train_chunk="1e1",
                       lr_decay="9.9e-1", grad_clip="0.0e0",
                       u_scale="1.0e0", ode_rtol="1.0e-5")
    assert cfg.ema_decay == 0.9 and isinstance(cfg.ema_decay, float)
    assert cfg.window_target_s == 120.0
    assert cfg.train_chunk == 10 and isinstance(cfg.train_chunk, int)
    assert cfg.N_r == 64 and isinstance(cfg.N_r, int)
    assert cfg.lr_decay == 0.99 and cfg.u_scale == 1.0
