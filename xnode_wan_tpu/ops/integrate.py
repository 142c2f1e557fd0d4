"""Fixed-step ODE integration along path time grids as one masked ``lax.scan``.

Replaces the reference's torchdiffeq ``odeint``/``odeint_adjoint`` calls over
``fillt``-densified, possibly ragged per-group grids
(reference ``src/model.py:103-106``, ``src/dataset.py:13-32``) with a single
static-shape scan:

* the scan walks the ``L`` sample times; each interval ``[t_{l-1}, t_l]`` is
  integrated with ``n_sub`` equal substeps of a fixed-step scheme
  (euler/midpoint/heun/rk4 — the torchdiffeq fixed-grid methods). Because
  sample grids are stratified (see ``ops/sampling.py``), a static ``n_sub``
  guarantees the reference's fillt invariant (step ``<= (T-T0)/min_steps``).

* masking handles everything the reference does with raggedness and
  ``bound_pad``: per-path start times (boundary re-entry), per-path exit
  (shrinking domains) and single-point paths all run through the same scan —
  invalid steps leave the carried state untouched.

* ``remat=True`` wraps each scan step in ``jax.checkpoint``: the TPU-native
  analogue of the reference's ``odeint_adjoint`` option (O(1)-in-depth
  activation memory on the backward pass).

The per-step field evaluations are whole-batch ``[N, H + d + 1]`` matmuls, so
the MXU sees one large GEMM per substep instead of the reference's per-group
Python loop.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

Field = Callable[[jax.Array, jax.Array], jax.Array]  # (t [N], h [N,H]) -> [N,H]


def _euler(field: Field, t, h, dt):
    return h + dt * field(t, h)


def _midpoint(field: Field, t, h, dt):
    k1 = field(t, h)
    return h + dt * field(t + 0.5 * dt[:, 0], h + 0.5 * dt * k1)


def _heun(field: Field, t, h, dt):
    k1 = field(t, h)
    k2 = field(t + dt[:, 0], h + dt * k1)
    return h + 0.5 * dt * (k1 + k2)


def _rk4(field: Field, t, h, dt):
    dt_ = dt[:, 0]
    k1 = field(t, h)
    k2 = field(t + 0.5 * dt_, h + 0.5 * dt * k1)
    k3 = field(t + 0.5 * dt_, h + 0.5 * dt * k2)
    k4 = field(t + dt_, h + dt * k3)
    return h + dt * (k1 + 2 * k2 + 2 * k3 + k4) / 6.0


STEPPERS = {"euler": _euler, "midpoint": _midpoint, "heun": _heun, "rk4": _rk4}

# Adams-Bashforth / Adams-Moulton coefficients on a uniform substep grid,
# per history length (most-recent function value first). The torchdiffeq
# fixed-grid multistep surface (`explicit_adams` = AB4 with incremental-
# order startup, `fixed_adams` = AB4-predict / AM4-correct PECE); the
# reference passes these method strings straight through
# (src/model.py:103-106).
_AB = {
    1: (1.0,),
    2: (3 / 2, -1 / 2),
    3: (23 / 12, -16 / 12, 5 / 12),
    4: (55 / 24, -59 / 24, 37 / 24, -9 / 24),
}
_AM = {  # first coefficient multiplies f(t_{k+1}, h_predicted)
    1: (1.0,),
    2: (1 / 2, 1 / 2),
    3: (5 / 12, 8 / 12, -1 / 12),
    4: (9 / 24, 19 / 24, -5 / 24, 1 / 24),
}

FIXED_METHODS = ("euler", "midpoint", "heun", "rk4",
                 "explicit_adams", "fixed_adams")
ADAPTIVE_METHODS = ("dopri5", "bosh3", "adaptive_heun", "fehlberg2",
                    "dopri8", "adams")

# Embedded Runge-Kutta tableaus for the adaptive integrator:
# (c nodes, A rows, b_high, b_low, controller order — the error
# order, so the step controller exponent is 1/order). dopri5 is
# Dormand-Prince 5(4) — torchdiffeq's default adaptive method; bosh3 is
# Bogacki-Shampine 3(2); adaptive_heun is the Heun-Euler 2(1) pair;
# fehlberg2 is Fehlberg's RK2(1) triple; dopri8 (built lazily below) is
# Hairer's 12-stage 8th-order Dormand-Prince pair — the full torchdiffeq
# adaptive method-name surface the reference's config string reaches
# (src/model.py:103-106).
_TABLEAUS = {
    "dopri5": (
        (0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0),
        (
            (),
            (1 / 5,),
            (3 / 40, 9 / 40),
            (44 / 45, -56 / 15, 32 / 9),
            (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
            (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
            (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
        ),
        (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0),
        (5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200,
         187 / 2100, 1 / 40),
        5,
    ),
    "bosh3": (
        (0.0, 1 / 2, 3 / 4, 1.0),
        ((), (1 / 2,), (0.0, 3 / 4), (2 / 9, 1 / 3, 4 / 9)),
        (2 / 9, 1 / 3, 4 / 9, 0.0),
        (7 / 24, 1 / 4, 1 / 3, 1 / 8),
        3,
    ),
    "adaptive_heun": (
        (0.0, 1.0),
        ((), (1.0,)),
        (1 / 2, 1 / 2),
        (1.0, 0.0),
        2,
    ),
    "fehlberg2": (
        (0.0, 1 / 2, 1.0),
        ((), (1 / 2,), (1 / 256, 255 / 256)),
        (1 / 512, 255 / 256, 1 / 512),
        (1 / 256, 255 / 256, 0.0),
        2,
    ),
}


# Hairer's DOP853 coefficients, vendored at full f64 precision so the
# solver has no scipy dependency (the literals were generated from
# scipy.integrate._ivp.dop853_coefficients — a private module whose
# layout may move between scipy releases — and are cross-checked against
# it when scipy is present, tests/test_integrate.py).
_DOP853_C = (
    0.0, 0.05260015195876773, 0.0789002279381516, 0.1183503419072274,
    0.2816496580927726, 0.3333333333333333, 0.25, 0.3076923076923077,
    0.6512820512820513, 0.6, 0.8571428571428571, 1.0,
)
_DOP853_A = (
    (),
    (0.05260015195876773,),
    (0.0197250569845379, 0.0591751709536137),
    (0.02958758547680685, 0.0, 0.08876275643042054),
    (0.2413651341592667, 0.0, -0.8845494793282861, 0.924834003261792),
    (0.037037037037037035, 0.0, 0.0, 0.17082860872947386,
     0.12546768756682242),
    (0.037109375, 0.0, 0.0, 0.17025221101954405, 0.06021653898045596,
     -0.017578125),
    (0.03709200011850479, 0.0, 0.0, 0.17038392571223998,
     0.10726203044637328, -0.015319437748624402, 0.008273789163814023),
    (0.6241109587160757, 0.0, 0.0, -3.3608926294469414, -0.868219346841726,
     27.59209969944671, 20.154067550477894, -43.48988418106996),
    (0.47766253643826434, 0.0, 0.0, -2.4881146199716677, -0.590290826836843,
     21.230051448181193, 15.279233632882423, -33.28821096898486,
     -0.020331201708508627),
    (-0.9371424300859873, 0.0, 0.0, 5.186372428844064, 1.0914373489967295,
     -8.149787010746927, -18.52006565999696, 22.739487099350505,
     2.4936055526796523, -3.0467644718982196),
    (2.273310147516538, 0.0, 0.0, -10.53449546673725, -2.0008720582248625,
     -17.9589318631188, 27.94888452941996, -2.8589982771350235,
     -8.87285693353063, 12.360567175794303, 0.6433927460157636),
)
_DOP853_B = (
    0.054293734116568765, 0.0, 0.0, 0.0, 0.0, 4.450312892752409,
    1.8915178993145003, -5.801203960010585, 0.3111643669578199,
    -0.1521609496625161, 0.20136540080403034, 0.04471061572777259,
)
_DOP853_E5 = (
    0.01312004499419488, 0.0, 0.0, 0.0, 0.0, -1.2251564463762044,
    -0.4957589496572502, 1.6643771824549864, -0.35032884874997366,
    0.3341791187130175, 0.08192320648511571, -0.022355307863886294,
)


def _dop853_tableau():
    """torchdiffeq's ``dopri8``: Hairer's 8th-order Dormand-Prince pair.

    The 12 integration stages and the 8th-order weights ``B`` are
    Hairer's published DOP853 coefficient tables (vendored above); the
    embedded lower-order solution is ``B - E5``, the 5th-order
    error-estimator row (``E5[12] = 0``, so the error never touches the
    FSAL stage and the pair fits the generic 12-stage tableau).
    Error ~ O(h^6) -> controller order 6. This is the same 8(5)
    accept/reject pair scipy's DOP853 steps with (scipy adds a 3rd-order
    correction term for stiffness robustness; torchdiffeq's dopri8
    likewise runs a plain embedded estimate).
    """
    b_lo = tuple(b - e for b, e in zip(_DOP853_B, _DOP853_E5))
    return _DOP853_C, _DOP853_A, _DOP853_B, b_lo, 6


def _tableau(method: str):
    if method == "dopri8" and "dopri8" not in _TABLEAUS:
        _TABLEAUS["dopri8"] = _dop853_tableau()
    return _TABLEAUS[method]


def _embedded_step(tableau, field: Field, t, h, dt):
    """One embedded RK step; returns (h_high, error_estimate)."""
    cs, rows, b_hi, b_lo, _ = tableau
    ks = []
    for c, row in zip(cs, rows):
        hk = h
        for a, k in zip(row, ks):
            hk = hk + dt * a * k
        ks.append(field(t + c * dt[:, 0], hk))
    h_hi = h
    err = jnp.zeros_like(h)
    for bh, bl, k in zip(b_hi, b_lo, ks):
        h_hi = h_hi + dt * bh * k
        err = err + dt * (bh - bl) * k
    return h_hi, err


# ---------------------------------------------------------------------------
# Adaptive-order Adams (torchdiffeq's ``adams``): variable-coefficient
# Adams-Bashforth-Moulton (VCABM) after Shampine & Gordon, the method
# torchdiffeq dispatches for the ``adams`` config string — the last name
# of the reference's torchdiffeq method surface (``src/model.py:103-106``).
# PE(CE): a divided-difference Adams-Bashforth predictor of the current
# order, one corrector application (the order-k Adams-Moulton in modified-
# divided-difference form), a second evaluation to refresh the difference
# table, with per-step error control AND per-step order selection (raise/
# lower by comparing the embedded order k-2..k+1 error estimates).
# Vectorized per path: every controller scalar becomes an [N] array, the
# difference table phi a static [N, K+1, H] buffer (entries beyond a
# path's current order are kept exactly zero), and the step/order
# decisions run under masks inside the same bounded-attempts scan
# structure as the embedded-RK integrator above.

_DEBUG_VCABM = False
_VCABM_MAX_ORDER = 12   # torchdiffeq's cap; order adapts in [1, 12]


def _gamma_star(n: int):
    """First ``n`` Adams-Moulton gamma* coefficients, exact.

    gamma*_0 = 1,  gamma*_k = -sum_{j<k} gamma*_j / (k + 1 - j) — the
    standard generating-function recurrence (Hairer I.III.1); used by the
    Shampine-Gordon order-raise test ERK+1 ~ |dt * gamma*_{k+1} *
    phi_{k+1}|.
    """
    from fractions import Fraction
    gs = [Fraction(1)]
    for k in range(1, n):
        gs.append(-sum(g / (k + 1 - j) for j, g in enumerate(gs)))
    return tuple(float(g) for g in gs)


def _vcabm_coeffs(tprev, next_t, dtype):
    """Variable-step Adams coefficients ``g [N, K+1]``, ``beta [N, K]``.

    The Shampine-Gordon recurrences on the history of accepted step
    times: ``beta_j`` rescales the stored modified divided differences to
    the current step ratio; ``g_j`` are the quadrature weights of the
    order-(j+1) predictor. Computed to full static width with safe
    denominators — entries at ``j >= order`` are garbage-but-finite and
    are only ever multiplied by exactly-zero ``phi`` rows or masked off
    downstream. Pure functions of the (gradient-free) time history, so
    the whole block is stop_gradient'd (discretize-then-optimize, same
    policy as the RK controller above).
    """
    K = _VCABM_MAX_ORDER
    t0 = tprev[:, 0]
    dtv = next_t - t0

    def safe(x):
        return jnp.where(jnp.abs(x) > 1e-30, x, 1.0)

    # beta_j = prod_{i<j} (t_{n+1} - t_{n-i}) / (t_n - t_{n-1-i})
    # (Hairer III.5.9; == 1 on a uniform grid)
    betas = [jnp.ones_like(t0)]
    for j in range(1, K):
        betas.append(betas[-1] * (next_t - tprev[:, j - 1])
                     / safe(t0 - tprev[:, j]))
    beta = jnp.stack(betas, axis=1)                       # [N, K]

    c = jnp.broadcast_to(1.0 / jnp.arange(1, K + 2, dtype=dtype),
                         (t0.shape[0], K + 1))
    g_list = [jnp.ones_like(t0)]
    for j in range(1, K + 1):
        if j == 1:
            c = c[:, :-1] - c[:, 1:]
        else:
            fac = (dtv / safe(next_t - tprev[:, j - 1]))[:, None]
            c = c[:, :-1] - c[:, 1:] * fac
        g_list.append(c[:, 0])
    g = jnp.stack(g_list, axis=1)                         # [N, K+1]
    return jax.lax.stop_gradient(g), jax.lax.stop_gradient(beta)


def _integrate_vcabm(field, h0, times, t_start, mask, rtol, atol,
                     max_steps, remat, strict):
    """VCABM along each path's sample grid (see header comment above).

    Same contract as ``integrate_adaptive``: bounded ``max_steps``
    attempts per sample interval, masked per-path start/exit, steps
    clamped to land exactly on sample times (torchdiffeq's ``advance``
    likewise clamps — the landing step is a genuine history point, no
    interpolation). Unlike the one-step RK pairs the method is stateful:
    the difference table, time history, order and step size carry across
    sample intervals in the scan carry.
    """
    K = _VCABM_MAX_ORDER
    dtype = h0.dtype
    n = h0.shape[0]
    gs_tab = jnp.asarray(_gamma_star(K + 2), dtype)       # [K+2]
    jidx = jnp.arange(K + 1)

    def take1(a, idx):                                     # [N,W],[N] -> [N]
        return jnp.take_along_axis(a, idx[:, None], axis=1)[:, 0]

    def takeh(a, idx):                                     # [N,W,H] -> [N,H]
        ix = jnp.broadcast_to(idx[:, None, None],
                              (a.shape[0], 1, a.shape[2]))
        return jnp.take_along_axis(a, ix, axis=1)[:, 0]

    def ratio(le, tol):
        return jax.lax.stop_gradient(
            jnp.sqrt(jnp.mean((le / tol) ** 2, axis=-1)))

    def interval(carry, t1v):
        h, t, dt, order, nhist, tprev, phi = carry
        span = jnp.maximum(t1v - t, 0.0)

        def body(_, carry):
            h, t, dt, order, nhist, tprev, phi = carry
            active = t < t1v - 1e-12
            # lazy per-path init: first attempt of the first NONZERO
            # interval starts at span/8 (order 1 — the controller
            # adapts). Gated on ``active`` so a zero-width leading
            # interval (the T0 shortcut) cannot consume the init with a
            # degenerate span.
            dt = jnp.where((dt <= 0) & active,
                           jnp.maximum(span, 1e-12) / 8.0, dt)
            dt_eff = jnp.maximum(
                jnp.minimum(jnp.where(active, dt, 0.0), t1v - t), 0.0)
            next_t = t + dt_eff

            g, beta = _vcabm_coeffs(tprev, next_t, dtype)
            expl = phi[:, :K, :] * beta[:, :, None]        # [N, K, H]
            # "order k" here = k predictor terms: p is the order-k
            # Adams-Bashforth value, the corrector's g_k*phi^p_k term
            # turns it into the order-(k+1) Adams-Moulton value (the
            # successive-order identity y^(m+1) - y^(m) =
            # dt*(g_{m+1}-g_m)*phi^p_{m+1}, which also gives the error
            # estimates below). k ranges 1..K-1, so the corrector order
            # tops out at K = 12 — torchdiffeq's max_order.
            pm = (jidx[None, :K] < order[:, None]).astype(dtype)
            p = h + dt_eff[:, None] * jnp.einsum(
                "nj,njh->nh", g[:, :K] * pm, expl)

            f_p = field(next_t, p)
            # predictor difference table phi^p_j = f_p - sum_{i<j} expl_i
            prefix = jnp.concatenate(
                [jnp.zeros((n, 1) + f_p.shape[1:], dtype),
                 jnp.cumsum(expl, axis=1)], axis=1)        # [N, K+1, H]
            php = f_p[:, None, :] - prefix                 # [N, K+1, H]

            y_next = p + dt_eff[:, None] * take1(g, order)[:, None] \
                * takeh(php, order)

            tol = atol + rtol * jnp.maximum(jnp.abs(h), jnp.abs(y_next))
            le_k = dt_eff[:, None] * (take1(g, order + 1)
                                      - take1(g, order))[:, None] \
                * takeh(php, order + 1)
            err_k = ratio(le_k, tol)
            accept = (err_k <= 1.0) & active

            # second evaluation refreshes the difference table (PECE)
            f_n = field(next_t, y_next)
            phi_full = f_n[:, None, :] - prefix            # [N, K+1, H]
            keep = (jidx[None, :] <= (order + 1)[:, None])[:, :, None]
            phi_new = jnp.where(keep, phi_full, 0.0)

            # order selection (Shampine-Gordon style): startup ramps
            # 1 -> 3, then compare the embedded estimates at orders
            # k-2..k+1 (same successive-order identity; the raise test
            # uses the gamma* proxy on the freshest high difference)
            om1 = jnp.maximum(order - 1, 0)
            om2 = jnp.maximum(order - 2, 0)
            err_km1 = ratio(dt_eff[:, None] * (take1(g, order)
                                               - take1(g, om1))[:, None]
                            * takeh(php, order), tol)
            err_km2 = ratio(dt_eff[:, None] * (take1(g, om1)
                                               - take1(g, om2))[:, None]
                            * takeh(php, om1), tol)
            err_kp1 = ratio(dt_eff[:, None]
                            * take1(jnp.broadcast_to(gs_tab, (n, K + 2)),
                                    order + 2)[:, None]
                            * takeh(phi_full, order + 1), tol)
            # lower only when BOTH lower-order estimates beat order k
            # (Shampine-Gordon's max-test; a min-test thrashes in f32
            # roundoff noise once the higher differences hit the
            # precision floor, pinning dt via the raise-keeps-dt rule)
            down = jnp.maximum(err_km1, err_km2) <= err_k
            up = (~down) & (order < K - 1) & (err_kp1 < err_k)
            adaptive = order + jnp.where(down, -1, jnp.where(up, 1, 0))
            startup = (nhist <= 4) | (order < 3)
            next_order = jnp.clip(
                jnp.where(startup, jnp.minimum(order + 1, 3), adaptive),
                1, K - 1)

            # step controller (torchdiffeq's constants: safety 0.9,
            # growth <= 10, shrink >= 0.2; exponent 1/(order+2) — the
            # corrector is order+1, local error ~ dt^(order+2)); a step
            # that raises the order keeps its size
            fac = jnp.clip(
                0.9 * (err_k + 1e-12)
                ** (-1.0 / (order.astype(dtype) + 2.0)), 0.2, 10.0)
            if _DEBUG_VCABM:
                jax.debug.print(
                    "    err_k={e} km1={a} km2={b} kp1={c} fac={f} "
                    "acc={ac} dt_eff={d}", e=err_k[0], a=err_km1[0],
                    b=err_km2[0], c=err_kp1[0], f=fac[0], ac=accept[0],
                    d=dt_eff[0])
            dt_acc = jnp.where(next_order > order, dt_eff, dt_eff * fac)
            dt_rej = dt_eff * fac
            dt_new = jnp.where(accept, dt_acc, dt_rej)
            dt = jnp.where(active,
                           jnp.maximum(dt_new, span / 1e4), dt)

            acc_h = accept[:, None]
            h = jnp.where(acc_h, y_next, h)
            t = jnp.where(accept, next_t, t)
            tprev = jnp.where(
                acc_h, jnp.concatenate([next_t[:, None], tprev[:, :-1]],
                                       axis=1), tprev)
            phi = jnp.where(accept[:, None, None], phi_new, phi)
            order = jnp.where(accept, next_order, order)
            nhist = jnp.where(accept, jnp.minimum(nhist + 1, K + 2),
                              nhist)
            return h, t, dt, order, nhist, tprev, phi

        h, t, dt, order, nhist, tprev, phi = jax.lax.fori_loop(
            0, max_steps, body, (h, t, dt, order, nhist, tprev, phi))

        # budget exhaustion: same contract as the RK integrator — strict
        # NaN-poisons; otherwise one forced error-UNCHECKED Euler step
        # over the remainder, after which the multistep history is no
        # longer consistent and is restarted (order 1) at t1.
        left = jnp.maximum(t1v - t, 0.0)
        exhausted = left > 1e-12
        if strict:
            h = jnp.where(exhausted[:, None], jnp.nan, h)
        else:
            h_forced = h + left[:, None] * field(t, h)
            h = jnp.where(exhausted[:, None], h_forced, h)
            f1 = field(t1v, h)
            phi_reset = jnp.zeros_like(phi).at[:, 0, :].set(f1)
            tprev_reset = (t1v[:, None]
                           - jnp.arange(K, dtype=dtype)[None, :])
            phi = jnp.where(exhausted[:, None, None], phi_reset, phi)
            tprev = jnp.where(exhausted[:, None], tprev_reset, tprev)
            order = jnp.where(exhausted, 1, order)
            nhist = jnp.where(exhausted, 1, nhist)
        t = jnp.where(exhausted, t1v, t)
        return (h, t, dt, order, nhist, tprev, phi)

    def step(carry, inp):
        t_l, m_l = inp
        h, t, dt, order, nhist, tprev, phi = carry
        t1 = jnp.where(m_l, jnp.maximum(t_l, t), t)
        new = interval(carry, t1)
        carry = tuple(
            jnp.where(m_l.reshape((-1,) + (1,) * (a.ndim - 1)), a, b)
            for a, b in zip(new, carry))
        return carry, carry[0]

    if remat:
        step = jax.checkpoint(step)

    t0 = jnp.asarray(t_start, dtype)
    f0 = field(t0, h0)
    phi0 = jnp.zeros((n, K + 1) + h0.shape[1:], dtype).at[:, 0, :].set(f0)
    # staggered fake history times keep the coefficient denominators
    # finite before real history exists (their phi rows are zero)
    tprev0 = t0[:, None] - jnp.arange(K, dtype=dtype)[None, :]
    carry0 = (h0, t0, jnp.zeros_like(t0),
              jnp.ones((n,), jnp.int32), jnp.ones((n,), jnp.int32),
              tprev0, phi0)
    xs = (jnp.moveaxis(times, 1, 0), jnp.moveaxis(mask, 1, 0))
    _, hs = jax.lax.scan(step, carry0, xs)
    return jnp.moveaxis(hs, 0, 1)


def integrate_adaptive(
    field: Field,
    h0: jax.Array,
    times: jax.Array,
    t_start: jax.Array,
    mask: jax.Array,
    rtol: float = 1e-5,
    atol: float = 1e-6,
    max_steps: int = 16,
    remat: bool = False,
    strict: bool = False,
    method: str = "dopri5",
) -> jax.Array:
    """Adaptive embedded RK along each path's sample grid.

    TPU-native adaptivity: per-path step sizes with a standard
    error-controlled accept/reject + PI(-ish) step controller, but over a
    STATIC bound of ``max_steps`` attempts per sample interval (a bounded
    ``fori_loop`` with masked updates rather than a data-dependent
    ``while_loop`` — reverse-mode differentiable and one fixed XLA
    program; finished paths idle under the mask). ``method`` selects the
    embedded pair — ``dopri5`` (RK5(4)), ``bosh3`` (RK3(2)),
    ``adaptive_heun`` (RK2(1)), ``fehlberg2`` (RK2(1)), ``dopri8``
    (Hairer's RK8(5)) — or the adaptive-order multistep ``adams``
    (VCABM, see ``_integrate_vcabm``): the full torchdiffeq adaptive
    method surface the reference exposes (``src/model.py:103-106``);
    tolerances via config (``ode_rtol``/``ode_atol``/``ode_max_steps``).
    """
    if method == "adams":
        return _integrate_vcabm(field, h0, times, t_start, mask, rtol,
                                atol, max_steps, remat, strict)
    tableau = _tableau(method)
    inv_order = 1.0 / tableau[4]

    def interval(h, t0v, t1v):
        span = jnp.maximum(t1v - t0v, 0.0)          # [N]
        dt = span / 4.0                              # initial guess

        def body(_, carry):
            h, t, dt = carry
            active = t < t1v - 1e-12
            dt_eff = jnp.minimum(jnp.where(active, dt, 0.0), t1v - t)
            dt_eff = jnp.maximum(dt_eff, 0.0)
            h_new, err = _embedded_step(tableau, field, t, h,
                                        dt_eff[:, None])
            tol = atol + rtol * jnp.maximum(jnp.abs(h), jnp.abs(h_new))
            # The accept/step-size controller is a discrete decision:
            # detach it (discretize-then-optimize) so backward sees fixed
            # accepted steps — also avoids sqrt'(0)=inf NaNs on idle paths.
            ratio = jax.lax.stop_gradient(
                jnp.sqrt(jnp.mean((err / tol) ** 2, axis=-1)))  # [N]
            accept = (ratio <= 1.0) & active
            h = jnp.where(accept[:, None], h_new, h)
            t = jnp.where(accept, t + dt_eff, t)
            fac = jnp.clip(0.9 * (ratio + 1e-12) ** -inv_order, 0.2, 5.0)
            dt = jnp.where(active, jnp.maximum(dt_eff * fac, span / 1e4),
                           dt)
            return h, t, dt

        h, t, _ = jax.lax.fori_loop(0, max_steps, body, (h, t0v, dt))
        # A path that exhausts ``max_steps`` before reaching t1 violates
        # the requested tolerance. ``strict=True`` is the torchdiffeq
        # analogue of its max_num_steps AssertionError: the interval is
        # NaN-poisoned so the failure is loud (``debug_nans: true``
        # pinpoints it host-side; a compiled program cannot raise).
        # ``strict=False`` degrades gracefully with one forced,
        # error-UNCHECKED full-span step — fine when exhaustion is a rare
        # transient, but the result is no longer tolerance-guaranteed
        # (raise ``ode_max_steps`` / loosen tolerances if this path is
        # being hit; the integrator test asserts tolerances are met well
        # before the budget on smooth fields).
        left = jnp.maximum(t1v - t, 0.0)
        exhausted = (left > 1e-12)[:, None]
        if strict:
            return jnp.where(exhausted, jnp.nan, h)
        h_last, _ = _embedded_step(tableau, field, t, h, left[:, None])
        return jnp.where(exhausted, h_last, h)

    def step(carry, inp):
        h, t_prev = carry
        t_l, m_l = inp
        t1 = jnp.where(m_l, jnp.maximum(t_l, t_prev), t_prev)
        h_new = interval(h, t_prev, t1)
        h = jnp.where(m_l[:, None], h_new, h)
        t_prev = jnp.where(m_l, t1, t_prev)
        return (h, t_prev), h

    if remat:
        # O(1)-in-L activation memory: recompute each sample interval's
        # accept/reject loop on the backward pass (same policy as the
        # fixed-step scan below).
        step = jax.checkpoint(step)

    xs = (jnp.moveaxis(times, 1, 0), jnp.moveaxis(mask, 1, 0))
    _, hs = jax.lax.scan(step, (h0, jnp.asarray(t_start, h0.dtype)), xs)
    return jnp.moveaxis(hs, 0, 1)


def integrate(
    field: Field,
    h0: jax.Array,        # [N, H] initial hidden state at t_start
    times: jax.Array,     # [N, L] per-path sample times (sorted where valid)
    t_start: jax.Array,   # [N]
    mask: jax.Array,      # [N, L] bool sample validity
    n_sub: int,
    method: str = "midpoint",
    remat: bool = False,
    unroll: int = 0,
) -> jax.Array:
    """Integrate ``dh/dt = field(t, h)`` to every valid sample time.

    ``unroll=0`` fully unrolls the scan; the shipped default is
    ``unroll=1`` — measured (round 5, benchmarks/compile_budget.json)
    strictly better at the d=5 shapes on both the fused-kernel and the
    XLA training paths: 2.5-4.3x faster compile at an equal-or-faster
    hot step. (The round-1 full-unroll recommendation predates the fused
    kernel and the remat restructuring.)
    Returns ``hs [N, L, H]``: the hidden state at each sample time (stale
    carry at masked-invalid positions — callers mask them out).

    Multistep methods (``explicit_adams`` = Adams-Bashforth order <=4,
    ``fixed_adams`` = AB-predict / Adams-Moulton-correct PECE order <=4)
    carry their function-value history across the uniform substeps WITHIN
    a sample interval and restart at interval boundaries — the substep
    size changes there, and the uniform-grid coefficients (torchdiffeq's
    fixed-grid Adams solvers likewise assume a uniform step) would be
    invalid across the seam. Startup inside each interval ramps the order
    1 -> 4 as history accumulates (the classical self-starting scheme).
    """
    if unroll <= 0:
        unroll = times.shape[1]

    if method in ("explicit_adams", "fixed_adams"):
        correct = method == "fixed_adams"

        def interval(h, t0, t1):
            dt = (jnp.maximum(t1 - t0, 0.0) / n_sub)[:, None]
            hist = []  # f evaluations, oldest first (uniform dt)
            for k in range(n_sub):
                t = t0 + k * dt[:, 0]
                hist.append(field(t, h))
                m = min(len(hist), 4)
                recent = hist[::-1][:m]
                inc = sum(c * f for c, f in zip(_AB[m], recent))
                h_pred = h + dt * inc
                if correct:
                    f_new = field(t + dt[:, 0], h_pred)
                    mc = min(len(hist) + 1, 4)
                    cc = _AM[mc]
                    inc = cc[0] * f_new + sum(
                        c * f for c, f in zip(cc[1:], recent[:mc - 1]))
                    h = h + dt * inc
                else:
                    h = h_pred
            return h
    else:
        stepper = STEPPERS[method]

        def interval(h, t0, t1):
            # dt is clamped at 0 so masked (discarded) steps can't poison
            # gradients through jnp.where with NaN/garbage.
            dt = (jnp.maximum(t1 - t0, 0.0) / n_sub)[:, None]
            for k in range(n_sub):
                h = stepper(field, t0 + k * dt[:, 0], h, dt)
            return h

    def step(carry, inp):
        h, t_prev = carry
        t_l, m_l = inp
        h_new = interval(h, t_prev, t_l)
        h = jnp.where(m_l[:, None], h_new, h)
        t_prev = jnp.where(m_l, t_l, t_prev)
        return (h, t_prev), h

    if remat:
        step = jax.checkpoint(step)

    xs = (jnp.moveaxis(times, 1, 0), jnp.moveaxis(mask, 1, 0))
    _, hs = jax.lax.scan(step, (h0, jnp.asarray(t_start, h0.dtype)), xs,
                         unroll=min(unroll, times.shape[1]))
    return jnp.moveaxis(hs, 0, 1)
