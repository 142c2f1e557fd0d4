"""L^p norm / relative error metrics (reference utils/auxillary_funcs.py:7-30)."""

import jax.numpy as jnp
import numpy as np
import pytest

from xnode_wan_tpu.utils.metrics import l_norm, masked_lp, rel_err


def test_masked_lp_ignores_invalid():
    vals = jnp.array([[1.0, 2.0, 100.0], [3.0, 100.0, 100.0]])
    mask = jnp.array([[True, True, False], [True, False, False]])
    got = float(masked_lp(vals, mask, volume=2.0, p=2.0))
    want = (2.0 * (1 + 4 + 9) / 3) ** 0.5
    assert got == pytest.approx(want)


def test_l_norm_full_mask_matches_reference_formula():
    u = jnp.array([[0.5, 1.0], [2.0, 0.0]])
    sol = jnp.array([[1.0, 1.0], [1.0, 1.0]])
    mask = jnp.ones((2, 2), bool)
    v = 8.0
    got = float(l_norm(u, sol, mask, v, 2.0))
    want = float((v * np.mean(np.abs(np.asarray(sol - u)) ** 2)) ** 0.5)
    assert got == pytest.approx(want)


def test_rel_err_scale_invariant():
    u = jnp.zeros((4, 3))
    sol = 5.0 * jnp.ones((4, 3))
    mask = jnp.ones((4, 3), bool)
    # u == 0 -> relative error is exactly 1 regardless of volume/scale
    assert float(rel_err(u, sol, mask, 3.7, 2.0)) == pytest.approx(1.0)
    assert float(rel_err(sol, sol, mask, 3.7, 2.0)) == pytest.approx(0.0)
