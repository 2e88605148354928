"""Fused Maxwell-update Pallas kernels (ops/field_kernels.py) vs the XLA
path (core/fields.py) — same jnp math inside a single kernel, so results
must match to round-off for every solver/order/CPML combination."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from epoch_tpu.core import Simulation
from epoch_tpu.core import fields as fld
from epoch_tpu.ops.field_kernels import make_field_half_kernel

DECK = """
begin:control
  nx = 48
  ny = 32
  t_end = 1.0
  nsteps = 4
  x_min = 0
  x_max = 48e-6
  y_min = 0
  y_max = 32e-6
  field_order = {order}
  {solver}
end:control
begin:boundaries
  bc_x_min = {bcx}
  bc_x_max = {bcx2}
  bc_y_min = periodic
  bc_y_max = periodic
end:boundaries
begin:species
  name = e
  charge = -1
  mass = 1.0
  number_density = 1e20
  nparticles_per_cell = 1
end:species
begin:output
  dt_snapshot = 1
end:output
"""


@pytest.mark.parametrize("order,solver,bcx,bcx2", [
    (2, "", "periodic", "periodic"),
    (4, "", "periodic", "periodic"),
    (6, "", "periodic", "periodic"),
    (2, "maxwell_solver = lehe_x", "simple_outflow", "simple_outflow"),
    (2, "", "cpml_laser", "cpml_outflow"),
])
def test_fused_field_update_matches_xla(tmp_path, order, solver, bcx,
                                        bcx2):
    d = tmp_path / f"o{order}{bcx}"
    d.mkdir()
    (d / "input.deck").write_text(
        DECK.format(order=order, solver=solver, bcx=bcx, bcx2=bcx2))
    sim = Simulation(str(d / "input.deck"), seed=2)
    cfg = sim.cfg
    plan = fld.FieldSolverPlan(cfg)
    rng = np.random.default_rng(0)
    shape = cfg.grid.padded_shape()
    dtype = cfg.dtype
    f = sim.state.fields
    f = f._replace(**{nm: jnp.asarray(rng.normal(size=shape) * 1e3, dtype)
                      for nm in ("ex", "ey", "ez", "bx", "by", "bz",
                                 "jx", "jy", "jz")})
    cpml = sim.state.cpml
    if cpml is not None:
        cpml = cpml.__class__(psi=tuple(
            jnp.asarray(rng.normal(size=np.asarray(p).shape), dtype)
            for p in cpml.psi))

    for which in ("e", "b"):
        run = make_field_half_kernel(cfg, plan, which, interpret=True)
        f_k, cpml_k = run(f, cpml)
        if which == "e":
            f_x, cpml_x = fld.update_e_field(f, cfg, plan, cpml)
            comps = ("ex", "ey", "ez")
            psi_idx = 0
        else:
            f_x, cpml_x = fld.update_b_field(f, cfg, plan, cpml)
            comps = ("bx", "by", "bz")
            psi_idx = 1
        for nm in comps:
            a = np.asarray(getattr(f_k, nm))
            b = np.asarray(getattr(f_x, nm))
            scale = max(np.abs(b).max(), 1e-30)
            assert np.abs(a - b).max() / scale < 1e-6, (which, nm)
        if cpml is not None:
            a = np.asarray(cpml_k.psi[psi_idx])
            b = np.asarray(cpml_x.psi[psi_idx])
            scale = max(np.abs(b).max(), 1e-30)
            assert np.abs(a - b).max() / scale < 1e-6, (which, "psi")
