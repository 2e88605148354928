"""Expression-language unit tests (parser/shunt.F90, evaluator_blocks.F90)."""
import numpy as np
import pytest

from epoch_tpu.deck.expr import Expression, parse, evaluate


def ev(text, **ctx):
    return Expression.compile(text)(ctx)


def test_arithmetic():
    assert ev("1 + 2 * 3") == 7
    assert ev("(1 + 2) * 3") == 9
    assert ev("2^3^2") == 512          # right associative
    assert ev("-2^2") == -4            # unary minus binds after ^? EPOCH: neg
    assert ev("10 / 4") == 2.5
    assert ev("3e2 + 1") == 301.0


def test_scientific_notation():
    assert ev("2.5e-24") == 2.5e-24
    assert ev("1.0e5") == 1.0e5
    assert ev("5.0e5") == 5.0e5


def test_constants():
    import epoch_tpu.constants as c
    assert ev("qe") == c.q0
    assert ev("me") == c.m0
    assert abs(ev("critical(2*pi*c/1e-6)") - 1.1148542159362036e27) < 1e15


def test_comparison_and_logic():
    assert ev("3 gt 2") == 1.0
    assert ev("2 lt 1") == 0.0
    assert ev("(3 gt 2) and (2 gt 1)") == 1.0
    assert ev("(3 gt 2) or (1 gt 2)") == 1.0


def test_functions():
    assert abs(ev("sqrt(16)") - 4) < 1e-14
    assert abs(ev("gauss(1, 1, 2)") - 1.0) < 1e-14
    assert abs(ev("gauss(3, 1, 2)") - np.exp(-1)) < 1e-14
    assert abs(ev("supergauss(0, 0, 1, 4)") - 1.0) < 1e-14
    assert ev("if(1 gt 0, 5, 6)") == 5
    assert ev("if(0 gt 1, 5, 6)") == 6
    assert abs(ev("atan2(1, 1)") - np.pi / 4) < 1e-14
    assert abs(ev("interpolate(2, 0, 0, 10, 100, 5)") - 50.0) < 1e-12


def test_context_variables():
    assert ev("4 * nx", nx=400.0) == 1600
    assert ev("-x_min", x_min=-4e-6) == 4e-6
    x = np.linspace(0, 1, 11)
    out = ev("x^2 + 1", x=x)
    np.testing.assert_allclose(out, x ** 2 + 1)


def test_time_varying_detection():
    assert Expression.compile("gauss(time, 1, 2)").time_varying
    assert not Expression.compile("gauss(x, 1, 2)").time_varying
    assert Expression.compile("sin(x)").space_varying


def test_species_function():
    e = Expression.compile("density(Electron) * 2")
    assert e({"density:Electron": 21.0}) == 42.0


def test_user_constants_inline():
    consts = {"lam": parse("2 * micron")}
    e = Expression.compile("2 * pi * c / lam", user_constants=consts)
    assert abs(e({}) - 2 * np.pi * 2.99792458e8 / 2e-6) < 1e8


def test_jax_backend():
    import jax.numpy as jnp
    e = Expression.compile("gauss(time, 4e-15, 4e-15)")
    v = e({"time": jnp.asarray(4e-15)}, xp=jnp)
    assert abs(float(v) - 1.0) < 1e-14
