#!/usr/bin/env python
"""Benchmark: particle pushes/sec/chip on the 2D LWFA north-star deck.

A moving-window laser-wakefield config (BASELINE.json: "epoch2d
moving-window LWFA"): laser injected at x_min, outflow x boundaries,
window tracking at c, electrons + protons at {ppc} per cell each.
Matches epoch2d/example_decks/window.deck extended with a laser driver
and CPML absorbing x boundaries (the BASELINE flagship configuration).
BENCH_MODE=periodic selects the round-1 all-periodic thermal deck.

Prints ONE JSON line {"metric","value","unit","vs_baseline"} plus an
"extras" dict recording the secondary flagship configs (BASELINE.json
configs 4-5 + instrumented variants): "rese" (the reference's QED
flagship geometry — counter-propagating lasers onto a uniform plasma,
epoch2d/example_decks/qed_rese.deck — WITHOUT its qed block: the
same-deck denominator), "qed" (rese + synchrotron, photon_dynamics=F),
"qed_cascade" (rese at cascade amplitude + produce_pairs + live
photons, the Breit-Wheeler flagship), "3d" (64^3 thermal),
"3d_physics" (3D laser-solid, field ionisation + binary collisions).
BENCH_EXTRAS=0 skips them; BENCH_MODE=<mode> benches one mode as the
primary metric.
Baseline (BASELINE.json): 1e9 particle-pushes/sec/chip target on TPU v5p.
"""
import json
import os
import sys
import time
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("EPOCH_TPU_X64", "0")   # single precision for perf

DECK_LWFA = """
begin:control
  precision = single
  bin_headroom = 2.0
  nx = {nx}
  ny = {ny}
  t_end = 1.0
  x_min = 0
  x_max = {lx}
  y_min = 0
  y_max = {ly}
end:control
begin:boundaries
  bc_x_min = cpml_laser
  bc_x_max = cpml_outflow
  bc_y_min = periodic
  bc_y_max = periodic
end:boundaries
begin:window
  move_window = T
  window_start_time = {t_start}
  window_v_x = 2.9979e8
  bc_x_min_after_move = cpml_outflow
  bc_x_max_after_move = cpml_outflow
end:window
begin:constant
  lambda0 = 1.0e-6
  omega0 = 2.0 * pi * c / lambda0
  w0 = {w0}
  den = 1.0e24
end:constant
begin:laser
  boundary = x_min
  amp = 3.0e12
  omega = omega0
  t_profile = gauss(time, 40e-15, 20e-15)
  profile = gauss(y, {yc}, w0)
end:laser
begin:species
  name = electron
  charge = -1
  mass = 1.0
  number_density = if(x gt {x0}, den, 0)
  nparticles_per_cell = {ppc}
  temperature_ev = 10
end:species
begin:species
  name = proton
  charge = 1
  mass = 1836.2
  number_density = if(x gt {x0}, den, 0)
  nparticles_per_cell = {ppc}
  temperature_ev = 1
end:species
begin:output
  dt_snapshot = 1
end:output
"""

DECK3D = """
begin:control
  precision = single
  bin_headroom = 2.0
  nx = {nx}
  ny = {ny}
  nz = {nz}
  t_end = 1.0
  x_min = 0
  x_max = {lx}
  y_min = 0
  y_max = {ly}
  z_min = 0
  z_max = {lz}
end:control
begin:boundaries
  bc_x_min = periodic
  bc_x_max = periodic
  bc_y_min = periodic
  bc_y_max = periodic
  bc_z_min = periodic
  bc_z_max = periodic
end:boundaries
begin:constant
  den = 1.0e24
end:constant
begin:species
  name = electron
  charge = -1
  mass = 1.0
  number_density = den
  nparticles_per_cell = {ppc}
  temperature_ev = 1000
end:species
begin:species
  name = proton
  charge = 1
  mass = 1836.2
  number_density = den
  nparticles_per_cell = {ppc}
  temperature_ev = 100
end:species
begin:output
  dt_snapshot = 1
end:output
"""

DECK_RESE = """
begin:control
  precision = single
  bin_headroom = {headroom}
  bin_overflow = merge
  nx = {nx}
  ny = {ny}
  t_end = 1.0
  x_min = 0
  x_max = {lx}
  y_min = 0
  y_max = {ly}
end:control
begin:boundaries
  bc_x_min = periodic
  bc_x_max = periodic
  bc_y_min = periodic
  bc_y_max = periodic
end:boundaries
begin:constant
  lambda0 = 1.0e-6
  den = 1.0e24
end:constant
begin:fields
  # seeded standing wave (the canonical seeded-cascade configuration:
  # two counter-propagating waves in a fully periodic box — the
  # Ey-only seed splits into the pair and the standing wave forms
  # within a quarter period; nothing leaves the box, so the timed
  # phase measures a sustained interaction, not a blow-out transient)
  ey = {amp} * sin(2 * pi * x / lambda0)
end:fields
begin:species
  name = electron
  identify:electron
  number_density = den
  nparticles_per_cell = {ppc}
  temperature_ev = 10
  bin_headroom = {headroom}
end:species
begin:species
  # static background: fixed ion inertia, never a creation target —
  # per-species slot sizing (bin_k_sp) keeps its kernel cheap
  name = ion
  identify:proton
  number_density = den
  nparticles_per_cell = {ppc}
  temperature_ev = 1
  bin_headroom = 1.25
end:species
begin:output
  dt_snapshot = 1
end:output
"""

DECK3D_SOLID = """
begin:control
  precision = single
  bin_headroom = 2.0
  nx = {nx}
  ny = {ny}
  nz = {nz}
  t_end = 1.0
  x_min = 0
  x_max = {lx}
  y_min = 0
  y_max = {ly}
  z_min = 0
  z_max = {lz}
  field_ionisation = T
end:control
begin:boundaries
  bc_x_min = simple_laser
  bc_x_max = open
  bc_y_min = periodic
  bc_y_max = periodic
  bc_z_min = periodic
  bc_z_max = periodic
end:boundaries
begin:constant
  lambda0 = 1.0e-6
  omega0 = 2.0 * pi * c / lambda0
  den = 5.0e28
end:constant
begin:laser
  boundary = x_min
  amp = 1.0e13
  omega = omega0
  t_profile = gauss(time, 30e-15, 15e-15)
  profile = gauss(y, {yc}, {w0}) * gauss(z, {zc}, {w0})
end:laser
begin:species
  name = electron
  charge = -1
  mass = 1.0
  number_density = if(x gt {x0}, den, 0)
  nparticles_per_cell = {ppc}
  temperature_ev = 100
end:species
begin:species
  name = hydrogen
  charge = 0
  mass = 1836.2
  number_density = if(x gt {x0}, den, 0)
  nparticles_per_cell = {ppc}
  ionisation_energies = (13.6 * ev)
  electron = electron
end:species
begin:collisions
  use_collisions = T
  coulomb_log = auto
  collide = all
end:collisions
begin:output
  dt_snapshot = 1
end:output
"""

DECK = """
begin:control
  precision = single
  bin_headroom = 1.5
  nx = {nx}
  ny = {ny}
  t_end = 1.0
  x_min = 0
  x_max = {lx}
  y_min = 0
  y_max = {ly}
end:control
begin:boundaries
  bc_x_min = periodic
  bc_x_max = periodic
  bc_y_min = periodic
  bc_y_max = periodic
end:boundaries
begin:constant
  den = 1.0e24
end:constant
begin:species
  name = electron
  charge = -1
  mass = 1.0
  number_density = den
  nparticles_per_cell = {ppc}
  temperature_ev = 1000
end:species
begin:species
  name = proton
  charge = 1
  mass = 1836.2
  number_density = den
  nparticles_per_cell = {ppc}
  temperature_ev = 100
end:species
begin:output
  dt_snapshot = 1
end:output
"""


def setup(mode=None):
    """Build the bench deck, run the untimed LWFA pre-phase, and return
    ``(cfg_bench, state)`` ready for the timed steady-state phase.
    Shared with scripts/profile_bench.py so profiles measure exactly the
    configuration the bench times."""
    import jax
    from epoch_tpu.core import Simulation
    from epoch_tpu.core.step import make_full_step

    nx = int(os.environ.get("BENCH_NX", 256))
    ny = int(os.environ.get("BENCH_NY", 256))
    ppc = int(os.environ.get("BENCH_PPC", 8))
    if mode is None:
        mode = os.environ.get("BENCH_MODE", "lwfa")

    d = tempfile.mkdtemp()
    with open(os.path.join(d, "input.deck"), "w") as f:
        if mode == "3d":
            nz = int(os.environ.get("BENCH_NZ", 64))
            nx = int(os.environ.get("BENCH_NX", 64))
            ny = int(os.environ.get("BENCH_NY", 64))
            ppc = int(os.environ.get("BENCH_PPC", 4))
            cell = 2.0e-8
            f.write(DECK3D.format(nx=nx, ny=ny, nz=nz, ppc=ppc,
                                  lx=nx * cell, ly=ny * cell,
                                  lz=nz * cell))
        elif mode == "3d_physics":
            # BASELINE.json config 4: epoch3d laser-solid with field
            # ionisation + binary collisions (example_decks/cone.deck
            # class).  Relativistic laser on a solid-density hydrogen
            # slab filling the right half of the box.
            n3 = int(os.environ.get("BENCH_N3", 128))
            ppc = int(os.environ.get("BENCH_PPC", 4))
            cell = 1.0e-8
            lx = n3 * cell
            f.write(DECK3D_SOLID.format(
                nx=n3, ny=n3, nz=n3, ppc=ppc,
                lx=lx, ly=lx, lz=lx, yc=0.5 * lx, zc=0.5 * lx,
                w0=0.25 * lx, x0=0.5 * lx))
        elif mode in ("rese", "qed", "qed_cascade"):
            # BASELINE.json config 5 in its 2D comparably-shaped form:
            # the reference's own QED flagship geometry
            # (epoch2d/example_decks/qed_rese.deck) — two counter-
            # propagating lasers onto a uniform plasma fill, periodic y,
            # static box.  The standing wave drives eta high enough for
            # synchrotron emission (and, at cascade amplitude, Breit-
            # Wheeler pairs) on the bulk electrons — unlike a windowed
            # LWFA deck, photons accumulate and populations GROW, which
            # is the physics the engine must sustain.  "rese" is the
            # same deck with no qed block: the honest same-deck
            # denominator for the qed*_vs_bare ratios.
            nx = int(os.environ.get("BENCH_NX", 384))
            ny = int(os.environ.get("BENCH_NY", 384))
            cell = 5.0e-8          # 20 cells per laser wavelength
            lx = nx * cell
            ly = ny * cell
            # a0 ~ 85 (the reference deck's 1e22 W/cm^2) for the
            # synchrotron-only mode; a0 ~ 230 for the cascade mode (eta
            # ~ 0.5 at the standing-wave antinodes: pairs genuinely
            # fire, emission stays within the sparse-tail caps)
            # 2.7e14 V/m = the reference deck's 1e22 W/cm^2 for the
            # synchrotron modes; 4e15 (a0 ~ 1170) for the cascade mode:
            # at the standing-wave antinodes eta >> 1 and photon chi is
            # high enough that Breit-Wheeler pairs genuinely fire
            # (measured: 17k+ positrons by the timed phase — at 8e14
            # the pair rate's exp(-8/3chi) suppression produced zero)
            amp = os.environ.get(
                "BENCH_QED_AMP",
                "4.0e15" if mode == "qed_cascade" else "2.7e14")
            # growth headroom lives on the per-species bin_headroom keys
            # (photons 3.0, positrons 1.0); the bulk species stay at 2.0
            headroom = os.environ.get("BENCH_BIN_HEADROOM", "2.0")
            text = DECK_RESE.format(nx=nx, ny=ny, ppc=ppc,
                                    lx=lx, ly=ly, amp=amp,
                                    headroom=headroom)
            tables = os.environ.get(
                "EPOCH_QED_TABLES",
                "/root/reference/epoch1d/src/physics_packages/TABLES")
            # per-species slot sizing: photons ACCUMULATE over the run
            # (no absorption) — 1.5x the emitter inheritance; positrons
            # stay a small population at these amplitudes/durations —
            # re-based to ~1 source-cell load.  Drops are counted.
            if mode == "qed_cascade":
                text += ("begin:qed\n  use_qed = T\n"
                         "  qed_start_time = 0\n  produce_photons = T\n"
                         f"  qed_table_location = {tables}\n"
                         "  photon_energy_min = 50 * kev\n"
                         "  produce_pairs = T\n"
                         "  photon_dynamics = T\nend:qed\n"
                         "begin:species\n  name = Photon\n"
                         "  identify:photon\n"
                         "  bin_headroom = 3.0\nend:species\n"
                         "begin:species\n  name = Positron\n"
                         "  identify:positron\n"
                         "  bin_headroom = 1.0\nend:species\n")
            elif mode == "qed":
                text += ("begin:qed\n  use_qed = T\n"
                         "  qed_start_time = 0\n  produce_photons = T\n"
                         f"  qed_table_location = {tables}\n"
                         "  photon_energy_min = 50 * kev\n"
                         "  photon_dynamics = F\nend:qed\n"
                         "begin:species\n  name = Photon\n"
                         "  identify:photon\n"
                         "  bin_headroom = 3.0\nend:species\n")
            f.write(text)
        elif mode in ("lwfa", "lwfa_mesh1"):
            # default 372 user cells/axis: CPML extends every axis by
            # 2*6 cells (mpi_routines.F90:290-291) to 384 = 48*8 = 3*128
            # — stripe- and lane-aligned for the fused kernel
            nx = int(os.environ.get("BENCH_NX", 372))
            ny = int(os.environ.get("BENCH_NY", 372))
            cell = 5.0e-8          # 20 cells per laser wavelength
            ly = ny * cell
            # the laser drives in while the box is static, then the
            # window starts and the x_min boundary becomes cpml_outflow
            # (window.F90:358-368) — the timed phase below measures the
            # post-switch moving-window steady state, the regime long
            # LWFA production runs spend ~all their time in
            t_start = float(os.environ.get("BENCH_TSTART", 50e-15))
            text = DECK_LWFA.format(nx=nx, ny=ny, ppc=ppc,
                                    lx=nx * cell, ly=ly,
                                    yc=0.5 * ly, w0=0.25 * ly,
                                    x0=0.25 * nx * cell,
                                    t_start=t_start)
            if mode == "lwfa_mesh1":
                # on-chip Mosaic proof of the shard_map'd fused kernel
                # (VERDICT r3 item 5): the flagship deck on an explicit
                # 1-device mesh — same ppermute/psum program as a real
                # multi-chip run, compiled by Mosaic, not interpret mode
                os.environ["EPOCH_TPU_SPMD_FORCE"] = "1"
                text = text.replace("begin:control",
                                    "begin:control\n  nprocx = 1", 1)
            f.write(text)
        else:
            cell = 2.0e-8
            f.write(DECK.format(nx=nx, ny=ny, ppc=ppc,
                                lx=nx * cell, ly=ny * cell))
    mesh = None
    if mode == "lwfa_mesh1":
        # auto_mesh declines 1-device meshes; build it explicitly
        from epoch_tpu.parallel.sharding import make_mesh
        mesh = make_mesh(n_devices=1)
    sim = Simulation(os.path.join(d, "input.deck"), mesh=mesh)

    st = sim.state
    cfg_bench = sim.cfg
    if mode in ("rese", "qed", "qed_cascade"):
        # untimed pre-phase: let the seeded standing wave and the
        # plasma response develop — the timed phase then measures the
        # sustained interaction, not the cold start
        # periodic standing-wave box: the wave pair forms within one
        # wavelength transit; 200 steps reach the developed interaction
        pre_steps = int(os.environ.get("BENCH_QED_PRESTEPS", 200))
        run_pre = make_full_step(cfg_bench)
        st = run_pre(st, pre_steps)
        jax.block_until_ready(st.fields.ex)
    if cfg_bench.bc_field_after_move is not None:
        # LWFA pre-phase (untimed): drive the laser pulse in with the
        # pre-move step set, then switch to the after-move BCs exactly
        # as the runner does (Simulation.fns_for / window.F90:358-368)
        import dataclasses
        import math as _math
        pre_steps = int(_math.ceil(cfg_bench.window_start_time
                                   / cfg_bench.dt))
        run_pre = make_full_step(cfg_bench)
        st = run_pre(st, pre_steps)
        jax.block_until_ready(st.fields.ex)
        cfg_bench = dataclasses.replace(
            cfg_bench, bc_field=tuple(cfg_bench.bc_field_after_move),
            bc_field_after_move=None)
    return cfg_bench, st


def count(st):
    tot = 0
    for s in st.species:
        if hasattr(s, "alive"):
            tot += int(s.alive.sum())
        else:
            tot += int((s.w > 0).sum())
    return tot


def sync(st):
    """Force completion by transferring a field to the host.

    jax.block_until_ready can return early on the tunnelled 'axon'
    platform when the waited-on output aliases a donated input buffer
    (measured: a 200-step chain 'completed' in 4 ms); a device→host
    transfer is an honest fence."""
    import numpy as np
    return float(np.asarray(st.fields.ex).ravel()[0])


def time_mode(mode, steps, chunk):
    """Compile + warm up ``mode``, then time ``steps`` steps twice-run
    (warmup run = the timed run's step count, single scanned compile).
    Returns pushes/s over the mean particle population."""
    from epoch_tpu.core.step import make_full_step

    cfg_bench, st = setup(mode)
    run_n = make_full_step(cfg_bench, chunk=chunk)
    # warmup with the same step count (single compile of the scanned step)
    st = run_n(st, steps)
    sync(st)
    n0 = count(st)
    t0 = time.perf_counter()
    st = run_n(st, steps)
    sync(st)
    dt_wall = time.perf_counter() - t0
    # population varies with window refill/outflow/emission: use the mean
    npart = 0.5 * (n0 + count(st))
    return npart * steps / dt_wall


def main():
    # default 1000 timed steps: the first dispatches through the tunnel
    # carry ~100 ms of fixed warm-up that distorts shorter runs (LWFA
    # production runs are O(10^4..10^5) steps — steady state is the
    # honest regime to report)
    steps = int(os.environ.get("BENCH_STEPS", 1000))
    chunk = int(os.environ.get("BENCH_CHUNK", 10))
    mode = os.environ.get("BENCH_MODE", "lwfa")
    pushes_per_sec = time_mode(mode, steps, chunk)

    # secondary flagship configs (VERDICT r3 item 3: driver-visible
    # numbers for every BASELINE config) — fewer timed steps (they are
    # slower per step and the point is the recorded figure, not a long
    # steady state); failures are recorded, never fatal to the primary
    out = {
        "metric": "particle_pushes_per_sec_per_chip",
        "value": pushes_per_sec,
        "unit": "pushes/s",
        "vs_baseline": pushes_per_sec / 1e9,
    }
    if mode == "lwfa" and os.environ.get("BENCH_EXTRAS", "1") != "0":
        xsteps = int(os.environ.get("BENCH_EXTRA_STEPS", 200))
        extras = {}
        for m in ("rese", "qed", "qed_cascade", "3d", "3d_physics",
                  "lwfa_mesh1"):
            try:
                extras[m] = time_mode(m, xsteps, chunk)
            except Exception as e:  # noqa: BLE001 — record, don't die
                extras[m] = "error: %s" % str(e)[:200]
        # QED overhead ratios against the SAME deck minus its qed block
        # ("rese"): deck-shape differences cancel, so the ratio isolates
        # what the QED machinery costs — the reference's own on/off
        # comparison (photons.F90 inside vs outside the one hot loop)
        bare = extras.get("rese")
        for m in ("qed", "qed_cascade"):
            extras[f"{m}_vs_bare"] = (
                bare / extras[m]
                if isinstance(bare, float)
                and isinstance(extras.get(m), float) else None)
        out["extras"] = extras
    print(json.dumps(out))


if __name__ == "__main__":
    main()
