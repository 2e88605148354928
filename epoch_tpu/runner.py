"""High-level run driver + CLI.

The reference binary reads the output directory from stdin or a
``USE_DATA_DIRECTORY`` file and always loads ``input.deck``
(``epoch1d.F90:64-91``); ``epoch_tpu`` keeps that contract:

    echo . | python -m epoch_tpu            # like  echo . | ./bin/epoch1d
    python -m epoch_tpu <data_dir>

Stop conditions (diagnostics.F90:3222): a ``STOP`` file in the data dir
halts with a restart dump, ``STOP_NODUMP`` without one.
"""
from __future__ import annotations

import os
import sys
import time as _time

import numpy as np

from .core.sim import Simulation
from .io.diagnostics import OutputManager


def welcome_message(stdout=sys.stdout):
    """welcome.F90:33-178 analogue: code name, version, backend."""
    from . import __version__
    import jax
    try:
        devs = ", ".join(str(d) for d in jax.devices())
    except Exception:
        devs = "unknown"
    print(f" epoch_tpu v{__version__} — TPU-native PIC "
          f"(EPOCH capability parity)", file=stdout)
    print(f" backend: {devs}", file=stdout)


class Runner:
    def __init__(self, data_dir: str, deck_name: str = "input.deck",
                 seed: int = 0, stdout=sys.stdout):
        self.data_dir = data_dir
        # every run decomposes over the available devices (the reference
        # splits every run, mpi_routines.F90:44-172): deck nprocx/y keys
        # or an automatic grid-x split.  EPOCH_TPU_MESH=0 forces a
        # single-program run.
        mesh = "auto" if os.environ.get("EPOCH_TPU_MESH", "auto") \
            not in ("0", "none", "") else None
        self.sim = Simulation(os.path.join(data_dir, deck_name), seed=seed,
                              mesh=mesh)
        welcome_message(stdout)
        if self.sim.cfg.mesh is not None:
            m = self.sim.cfg.mesh
            print(" decomposition: "
                  + " x ".join(f"{m.shape[a]} ({a})" for a in m.axis_names),
                  file=stdout)
        # deck.status + stat file (setup.F90:455-553)
        try:
            with open(os.path.join(data_dir, "deck.status"), "w") as f:
                f.write("Deck read OK\n")
                c = self.sim.deck.control
                f.write(f"nx={c.nx} ny={c.ny} nz={c.nz} "
                        f"t_end={c.t_end} dt={self.sim.cfg.dt}\n")
                f.write(f"engine={self.sim.cfg.engine}\n")
                for s in self.sim.cfg.species:
                    f.write(f"species {s.name}: cap={s.cap}\n")
            with open(os.path.join(data_dir, "epoch_tpu.dat"), "w") as f:
                f.write(f"dt {self.sim.cfg.dt}\n")
        except OSError:
            pass
        # restart_snapshot = <file> resumes from a restart dump
        # (deck_control_block 'restart_snapshot'; setup.F90:822)
        rs = self.sim.deck.control.restart_snapshot
        if rs:
            from .io.checkpoint import read_restart
            path = rs if os.path.isabs(rs) else os.path.join(data_dir, rs)
            if not os.path.exists(path) and not rs.endswith(".sdf"):
                path = path + ".sdf"
            st = read_restart(path, self.sim.cfg, self.sim.state)
            # carried halo sides are derived data nulled by read_restart;
            # re-stage them from the restored slot arrays
            st = self.sim.fns["prime_sides"](st)
            # restart dumps are written at the mid-step output point; the
            # reference completes the step on restart (time += dt/2,
            # update_eb_fields_final, moving_window — epoch1d.F90:144-152),
            # so run the step_b half before entering the main loop
            self.sim.state = self.sim.fns_for(st)["step_b"](st)
        self.out = OutputManager(self.sim.cfg, self.sim.deck, data_dir,
                                 n_zeros=self.sim.deck.control.n_zeros)
        if rs:
            # persistent-subset membership survives the restart
            # (build_persistent_subsets/id_registry, diagnostics.F90:2510)
            from .io.checkpoint import read_persistent_members
            try:
                self.out.persistent_members.update(
                    read_persistent_members(path))
            except Exception:
                pass
            # resume the lazy particle-ID counter past any assigned ids
            import numpy as _np
            from .core.binned import decode_ids
            aux_names = tuple(getattr(self.sim.cfg, "binned_aux", ()))
            top = 0
            for s in self.sim.state.species:
                if hasattr(s, "xi"):
                    ids = decode_ids(s.aux, aux_names)
                    if ids is not None:
                        top = max(top, int(ids.max(initial=0)))
                elif hasattr(s, "id"):
                    top = max(top, int(_np.asarray(s.id).max(initial=0)))
            self.out.id_counter = top + 1
        self.stdout = stdout
        self._t0 = _time.time()
        # walltime stop machinery (check_walltime_auto,
        # diagnostics.F90:3323-3410): EWMA step/io timers feed the
        # will-another-step-fit estimate
        from .utils.timers import Timers
        self.timers = Timers()
        self.stop_at_walltime = self.sim.deck.control.stop_at_walltime

    def write_restart(self, name="restart.sdf"):
        from .io.checkpoint import write_restart
        write_restart(os.path.join(self.data_dir, name), self.sim.cfg,
                      self.sim.state, deck_text=self.sim.deck.deck_text,
                      persistent_members=getattr(self.out,
                                                 "persistent_members", None)
                      if hasattr(self, "out") else None)

    def run(self, max_steps=None):
        sim = self.sim
        cfg = sim.cfg
        st = sim.state
        deck = sim.deck
        check_every = max(deck.control.check_stop_frequency, 1)
        stdout_freq = deck.control.stdout_frequency
        st = self.out.maybe_dump(sim, st)     # initial dump
        nsteps = cfg.nsteps if cfg.nsteps >= 0 else None
        if max_steps is not None:
            nsteps = min(nsteps, max_steps) if nsteps is not None else max_steps
        halt = False
        from .utils import timers as _tm
        while not halt:
            t = float(st.time)
            s = int(st.step)
            if (nsteps is not None and s >= nsteps) or t >= cfg.t_end:
                break
            if self.stop_at_walltime > 0 and self._walltime_exceeded():
                # check_walltime_auto (diagnostics.F90:3323): halt with a
                # forced restart dump when another step would not fit
                # before the walltime limit — a scheduler-killed run must
                # never lose its state
                self.sim.state = st
                self.write_restart()
                print(" Stopping because \"stop_at_walltime\" has been "
                      "exceeded.", file=self.stdout)
                break
            fns = sim.fns_for(st)
            self.timers.start(_tm.STEP)
            st = fns["step_a"](st)
            s = int(st.step)
            if deck.control.use_nan_check:
                self._nan_check(st)
            if stdout_freq and s % stdout_freq == 0:
                self._status_line(st)
            self.timers.stop(_tm.STEP)
            self.timers.start(_tm.IO)
            st = self.out.maybe_dump(sim, st)
            self.timers.stop(_tm.IO)
            if s % check_every == 0:
                # sync the live state first: a STOP-file restart dump must
                # contain the current step, not the stale initial state
                self.sim.state = st
                halt = self._check_stop()
            self.timers.start(_tm.STEP)
            st = fns["step_b"](st)
            self.timers.stop(_tm.STEP)
        sim.state = st
        st = self.out.maybe_dump(sim, st, last=True)
        sim.state = st
        self._overflow_warnings(st)
        return st

    def _overflow_warnings(self, st):
        """End-of-run capacity warnings: a fixed-capacity framework that
        silently loses created particles is a correctness hazard (the
        reference's dynamic lists cannot overflow)."""
        dropped = int(st.slab_dropped) if st.slab_dropped is not None else 0
        if dropped > 0:
            print(f" WARNING: {dropped} created particles were dropped by "
                  f"full species slabs — raise species capacity "
                  f"(bin_headroom / nparticles)", file=self.stdout)
        merged = getattr(self.sim.cfg, "bin_overflow", "drop") == "merge"
        for sp_cfg, s in zip(self.sim.cfg.species, st.species):
            nd = int(getattr(s, "n_dropped", 0))
            if nd > 0 and merged:
                print(f" NOTE: species {sp_cfg.name}: {nd} macro-"
                      f"particles merged by slot-grid overflow "
                      f"(bin_overflow = merge conserves weight/charge/"
                      f"momentum; raise bin_headroom to avoid merging)",
                      file=self.stdout)
            elif nd > 0:
                print(f" WARNING: species {sp_cfg.name}: {nd} particles "
                      f"dropped by slot-grid overflow — raise "
                      f"bin_headroom", file=self.stdout)
        for pp, pd in zip(self.sim.cfg.probe_plans, st.probe_dropped):
            npd = int(pd)
            if npd > 0:
                print(f" WARNING: probe {pp.name}: {npd} crossings "
                      f"dropped (capture cap / full probe buffer) — the "
                      f"reference keeps every crossing", file=self.stdout)

    def _nan_check(self, st):
        """Debug sanitizer (use_nan_check deck key): the runtime analogue
        of the reference debug build's FPE traps (Makefile:92-99,
        -ffpe-trap=invalid,zero,overflow).  Costs a device sync per step —
        debug runs only."""
        for nm in st.fields._fields:
            a = getattr(st.fields, nm)
            if not bool(np.isfinite(np.asarray(a)).all()):
                raise FloatingPointError(
                    f"nan_check: non-finite values in field '{nm}' at "
                    f"step {int(st.step)} (t={float(st.time):.6e})")
        for sp_cfg, s in zip(self.sim.cfg.species, st.species):
            p = np.asarray(s.p)
            live = np.asarray(s.w > 0) if hasattr(s, "w") \
                else np.asarray(s.alive)
            sel = p[:, live] if hasattr(s, "w") else p[live]
            if sel.size and not np.isfinite(sel).all():
                raise FloatingPointError(
                    f"nan_check: non-finite momentum in species "
                    f"'{sp_cfg.name}' at step {int(st.step)}")

    def _status_line(self, st):
        # per-step stdout line with runtime + ETA (diagnostics.F90:245-282);
        # on a tty the line rewrites in place (terminal_controls.F90)
        t = float(st.time)
        frac = min(t / self.sim.cfg.t_end, 1.0) if self.sim.cfg.t_end else 0.0
        wall = _time.time() - self._t0
        eta = wall / frac - wall if frac > 0 else 0.0
        line = (f" Time {t:14.6e}  step {int(st.step):8d}  "
                f"wall {wall:8.1f}s  eta {eta:8.1f}s")
        if getattr(self.stdout, "isatty", lambda: False)():
            print("\r" + line, end="", file=self.stdout, flush=True)
        else:
            print(line, file=self.stdout)

    def _walltime_exceeded(self):
        """check_walltime_auto (diagnostics.F90:3337-3346, single-
        controller form): would finishing another step + its io cross
        stop_at_walltime?"""
        from .utils import timers as _tm
        elapsed = _time.time() - self._t0
        budget = (elapsed + self.timers.avg[_tm.STEP]
                  + self.timers.avg[_tm.IO])
        return budget >= self.stop_at_walltime

    def _check_stop(self):
        # the STOP-file check point also honours stop_at_walltime
        # directly (check_for_stop_condition, diagnostics.F90:3253-3259)
        if self.stop_at_walltime > 0 \
                and _time.time() - self._t0 >= self.stop_at_walltime:
            self.write_restart()
            print(" Stopping because \"stop_at_walltime\" has been "
                  "exceeded.", file=self.stdout)
            return True
        for name, dump in (("STOP", True), ("STOP_NODUMP", False)):
            p = os.path.join(self.data_dir, name)
            if os.path.exists(p):
                os.remove(p)
                if dump:
                    self.write_restart()
                print(f" Halting on {name} file", file=self.stdout)
                return True
        return False


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if argv and argv[0] == "VERSION_INFO":
        from . import __version__
        print(f"epoch_tpu {__version__}")
        return 0
    if argv:
        data_dir = argv[0]
    else:
        # stdin / USE_DATA_DIRECTORY protocol (epoch1d.F90:64-91)
        use_file = "USE_DATA_DIRECTORY"
        if os.path.exists(use_file):
            data_dir = open(use_file).read().strip()
        else:
            data_dir = sys.stdin.readline().strip()
    if not data_dir:
        print("no data directory given", file=sys.stderr)
        return 1
    runner = Runner(data_dir)
    runner.run()
    return 0


if __name__ == "__main__":
    sys.exit(main())
