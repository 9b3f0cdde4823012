"""Driver entry-point tests: entry() traces on CPU; dryrun runs on the
8-device mesh (already initialized by conftest)."""

import jax
import numpy as np
import pytest


def test_entry_traces():
    import __graft_entry__ as g
    fn, args = g.entry()
    # abstract trace only (full-size model; avoid a CPU compile here)
    lowered = jax.jit(fn).lower(*args)
    assert "depth" not in ()  # lowering succeeded
    hlo = lowered.as_text()
    assert len(hlo) > 1000


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as g
    g.dryrun_multichip(8)
