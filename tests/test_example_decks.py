"""Example-deck smoke suite (SURVEY §4: "example decks as smoke suite").

Each reference example deck class must parse AND run a few steps of the
full driver at shrunken resolution.  Grid/particle counts are rewritten
down so CPU compile+run stays tractable; everything else (physics blocks,
expressions, boundary/window/laser configs) is the reference text.
"""
import os
import re
import io

import numpy as np
import pytest

from conftest import REFERENCE
from epoch_tpu.runner import Runner

TABLES = os.path.join(REFERENCE, "epoch1d/src/physics_packages/TABLES")

# one deck per class (1d where available, 2d for the 2d-only classes)
DECKS = [
    "epoch1d/example_decks/twostream_deltaf.deck",
    "epoch1d/example_decks/power_law.deck",
    "epoch1d/example_decks/filter.deck",
    "epoch1d/example_decks/injectors.deck",
    "epoch1d/example_decks/qed_rese.deck",
    "epoch1d/example_decks/bremsstrahlung.deck",
    "epoch1d/example_decks/window.deck",
    "epoch2d/example_decks/window.deck",
    "epoch2d/example_decks/ramp.deck",
    "epoch2d/example_decks/laser_focus.deck",
    "epoch2d/example_decks/cone.deck",
    "epoch2d/example_decks/ionisation.deck",
]


def _shrink(text, path):
    """Rewrite resolution/particle-count keys down for a smoke run."""
    def sub(key, val, s):
        return re.sub(rf"(?m)^(\s*{key}\s*=\s*).*$", rf"\g<1>{val}", s)

    text = sub("t_end", "1.0", text)
    text = sub("nsteps", "-1", text)
    text = sub("nx", 24, text)
    text = sub("ny", 12, text)
    text = sub("nz", 8, text)
    # particle counts: a few per cell
    text = re.sub(r"(?m)^(\s*npart\s*=\s*).*$", r"\g<1>2048", text)
    text = re.sub(r"(?m)^(\s*nparticles\s*=\s*).*$", r"\g<1>2048", text)
    text = re.sub(r"(?m)^(\s*nparticles_per_cell\s*=\s*).*$",
                  r"\g<1>3", text)
    text = re.sub(r"(?m)^(\s*npart_per_cell\s*=\s*).*$", r"\g<1>3", text)
    # table locations for QED / bremsstrahlung physics
    if "use_qed" in text and "qed_table_location" not in text:
        text = text.replace("begin:qed",
                            f"begin:qed\n  qed_table_location = {TABLES}", 1)
    if "use_bremsstrahlung" in text and "table_location" not in text:
        text = text.replace(
            "begin:bremsstrahlung",
            "begin:bremsstrahlung\n  table_location = "
            + os.path.join(REFERENCE,
                           "epoch1d/src/physics_packages/TABLES/br"),
            1)
    return text


@pytest.mark.slow
@pytest.mark.parametrize("rel", DECKS, ids=lambda p: p.replace("/", "_"))
def test_example_deck_smoke(rel, tmp_path):
    src = os.path.join(REFERENCE, rel)
    text = _shrink(open(src).read(), src)
    (tmp_path / "input.deck").write_text(text)
    r = Runner(str(tmp_path), stdout=io.StringIO())
    st = r.run(max_steps=3)
    assert int(st.step) >= 3
    # fields stay finite
    assert bool(np.isfinite(np.asarray(st.fields.ex)).all())
    assert bool(np.isfinite(np.asarray(st.fields.by)).all())
    for s in st.species:
        arr = s.p if hasattr(s, "xi") else s.p
        assert bool(np.isfinite(np.asarray(arr)).all())
