import math

import numpy as np
import pytest

from fastpm_tpu.cosmology import Cosmology
from fastpm_tpu.kdk import KickFactor, DriftFactor
from fastpm_tpu.timemachine import (StateTable, ACTION_FORCE, ACTION_KICK,
                                    ACTION_DRIFT)

C = Cosmology(h=0.6774, Omega_m=0.307494, T_cmb=0.0, growth_mode="lcdm")


def test_pm_factors_match_quadrature_eds():
    """In EdS (Omega_m=1) the standard integrals are analytic:
    kick = int da/(a^2 E) = 2(sqrt(af)-sqrt(ai)),
    drift = int da/(a^3 E) = (2/3)(ai^-1.5... ) actually
    int a^-3 * a^1.5 da = int a^-1.5 da = -2(af^-0.5 - ai^-0.5)."""
    c = Cosmology(h=0.7, Omega_m=1.0, growth_mode="lcdm")
    kick = KickFactor(c, "pm", 0.5, 0.7, 0.9)
    dda = kick.coefficients(0.5, 0.9)[0]
    expected = -1.5 * 1.0 * 2 * (math.sqrt(0.9) - math.sqrt(0.5))
    assert dda == pytest.approx(expected, rel=1e-6)

    drift = DriftFactor(c, "pm", 0.5, 0.7, 0.9)
    dyyy = drift.coefficients(0.5, 0.9)[0]
    expected = -2 * (0.9 ** -0.5 - 0.5 ** -0.5)
    assert dyyy == pytest.approx(expected, rel=1e-6)


def test_fastpm_factors_reproduce_linear_growth():
    """The defining property of the FastPM scheme: for a particle whose
    displacement follows linear theory (x = q + D1(a) dx1, with the ZA
    force acc = -1.5 Om D1(a_c)... actually acc on the mesh equals
    dx1 * (growth source)), one kick+drift across a step advances the
    displacement by exactly D1(af) - D1(ai).

    Internal velocity is y' = a^2 E dx/da... With v = dD1/da * a^2 E * dx1
    (the 2LPT velocity), a FASTPM drift from ai to af must displace by
    exactly (D1(af) - D1(ai)) * dx1 when v is evaluated at ac.
    """
    ai, ac, af = 0.4, 0.5, 0.6
    drift = DriftFactor(C, "fastpm", ai, ac, af)
    dyyy = drift.coefficients(ai, af)[0]
    # internal velocity a^2 dx/dt / H0 at ac for unit dx1:
    # v = a^3 E dD1/da (pm_2lpt_evolve: v = D1 f1 a^2 E)
    v_c = C.dD1da(ac) * ac ** 3 * C.E(ac)
    displacement = v_c * dyyy
    expected = C.D1(af) - C.D1(ai)
    assert displacement == pytest.approx(expected, rel=1e-10)


def test_fastpm_kick_reproduces_linear_velocity():
    """Dual property for the kick: with acceleration equal to the linear-
    theory value at ac (acc = -1.5 Om(ac)... the ZA acceleration for unit
    dx1 is a_acc = 1.5 Omega_source(ac) D1(ac)? -- the Poisson equation
    gives acc = -1.5 Om0 * grad phi with delta = -div(D1 dx1)), a FASTPM
    kick advances v by exactly Dv1(af) - Dv1(ai) where
    Dv1 = D1 f1 a^2 E = dD1/da a^3 E.

    Per factors.c:292-299, dda = -1.5 Om(ac) ac E_c (G_f(ae)-G_f(ai))/g_f(ac)
    and the ZA acceleration for unit dx1 is acc_za such that
    acc_za * dda == Dv1(af)-Dv1(ai). This fixes acc_za =
    -g_f(ac) / (1.5 Om(ac) ac E_c) * d(Dv1)/d(G_f) ... G_f = a^3 E dD/da
    = Dv1/..., in fact G_f == a^3 E g_p = a Dv1/... Let's verify
    G_f(a) = dD1/da * a^3 E and Dv1(a) = D1 f1 a^2 E = a^2 E dD1/da * a
    ... D1 f1 / a * a^2... D1 * f1 = a dD1/da so Dv1 = a^3 E dD1/da = G_f.
    So kick moves v by (G_f(af)-G_f(ai)) * [-1.5 Om_c ac E_c / g_f(ac)] *
    acc_za; linear theory needs v growing by G_f(af)-G_f(ai), hence
    acc_za = -g_f(ac)/(1.5 Om(ac) ac E_c) -- and indeed the PM force on a
    ZA-displaced field gives exactly that (the growth ODE).
    """
    ai, ac, af = 0.4, 0.5, 0.6
    kick = KickFactor(C, "fastpm", ai, ac, af)
    dda = kick.coefficients(ai, af)[0]

    def G_f(a):
        return C.dD1da(a) * a ** 3 * C.E(a)

    # Dv1 == G_f up to the LCDM-mode f1 fitting formula (Om^{5/9}, ~0.1%);
    # in ODE mode the identity is exact since f1 = dlnD/dlna there.
    for a in (ai, ac, af):
        gi = C.growth_info(a)
        assert gi.D1 * gi.f1 * a * a * C.E(a) == pytest.approx(G_f(a), rel=3e-3)
    c_ode = C.replace(growth_mode="ode")
    for a in (ai, ac, af):
        gi = c_ode.growth_info(a)
        G_f_ode = c_ode.dD1da(a) * a ** 3 * c_ode.E(a)
        assert gi.D1 * gi.f1 * a * a * c_ode.E(a) == pytest.approx(G_f_ode, rel=1e-9)

    # The growth ODE: d(G_f)/da = 1.5 Omega_source(a) a E D1 (in these
    # variables). So the linear-theory acceleration per unit dx1 at ac is
    # acc = -g_f(ac) / (1.5 Om_src(ac) ac E_c) * ... -- check the factor
    # chain is self-consistent: kick with acc=1 gives dda, and
    # dda / (G_f(af)-G_f(ai)) = -1.5 Om_c ac E_c / g_f(ac).
    ratio = dda / (G_f(af) - G_f(ai))
    g_f_c = (3 * ac * ac * C.E(ac) * C.dD1da(ac)
             + ac ** 3 * C.dEda(ac) * C.dD1da(ac)
             + ac ** 3 * C.E(ac) * C.d2D1da2(ac))
    expected_ratio = -1.5 * C.Omega_source(ac) * ac * C.E(ac) / g_f_c
    assert ratio == pytest.approx(expected_ratio, rel=1e-8)


def test_lookup_interpolation():
    kick = KickFactor(C, "fastpm", 0.4, 0.5, 0.6)
    # endpoints exact
    assert kick.lookup(0.4)[0] == kick.dda[0]
    assert kick.lookup(0.6)[0] == kick.dda[-1]
    # interior values interpolate linearly between samples
    mid = kick.lookup(0.5)
    assert kick.dda.min() <= mid[0] <= kick.dda.max()
    # zero-length kick
    z = kick.coefficients(0.5, 0.5)
    assert z[0] == 0 and z[1] == 0 and z[2] == 0


def test_cola_q_factors():
    kick = KickFactor(C, "cola", 0.4, 0.5, 0.6)
    gi = C.growth_info(0.5)
    assert kick.q1 == pytest.approx(gi.D1)
    Om = C.Omega_source(0.5)
    assert kick.q2 == pytest.approx(
        gi.D1 ** 2 * (1 + 7.0 / 3.0 * Om ** (1.0 / 143.0)))


def test_state_table_structure():
    ts = [0.1, 0.55, 1.0]
    st = StateTable(ts)
    trans = st.transitions()
    # first transition is the warmup force at a0
    assert trans[0].action == ACTION_FORCE
    assert trans[0].a_f == pytest.approx(0.1)
    # per cycle: K D D F K
    actions = [t.action for t in trans[1:6]]
    assert actions == [ACTION_KICK, ACTION_DRIFT, ACTION_DRIFT,
                       ACTION_FORCE, ACTION_KICK]
    # total = 1 warmup + 5 per cycle * 2 cycles
    assert len(trans) == 1 + 5 * 2
    # the kick of the first cycle spans [a0, sqrt(a0*a1)] (log midpoint)
    k1 = trans[1]
    assert k1.a_i == pytest.approx(0.1)
    assert k1.a_f == pytest.approx(math.exp(0.5 * (math.log(0.1) + math.log(0.55))))
    # final state is synced at the last timestep
    last = trans[-1]
    assert last.a_f == pytest.approx(1.0)


def test_state_table_dual():
    st = StateTable([0.1, 0.55, 1.0])
    trans = st.transitions()
    # the final kick of a cycle ends at a synced state; its dual is the
    # preceding drift, inverted
    k_final = trans[5]
    assert k_final.action == ACTION_KICK
    i_end = 6  # table position after warmup(1) + 5 transitions
    dual = st.find_dual(i_end - 1, ACTION_KICK)
    assert dual is not None
    assert dual.action == ACTION_DRIFT
    assert dual.a_r == pytest.approx(k_final.a_i)


def test_consistency_asserts_stamps():
    """Position/velocity stamps advance consistently (solver.c:508-513)."""
    st = StateTable([0.1, 0.4, 0.7, 1.0])
    a_x = a_v = 0.1
    for t in st.transitions():
        if t.action == ACTION_KICK:
            assert t.a_i == pytest.approx(a_v)
            a_v = t.a_f
        elif t.action == ACTION_DRIFT:
            assert t.a_i == pytest.approx(a_x)
            a_x = t.a_f
    assert a_x == pytest.approx(1.0)
    assert a_v == pytest.approx(1.0)
