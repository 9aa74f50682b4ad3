"""Driver-entry sanity: entry() compiles and dryrun_multichip runs on the
8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import pytest

import conftest  # noqa: F401  (forces cpu + 8 virtual devices)

pytestmark = pytest.mark.parity


def test_entry_compiles():
    import __graft_entry__ as g
    fn, args = g.entry()
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    assert compiled is not None


def test_dryrun_multichip():
    assert jax.device_count() >= 8
    import __graft_entry__ as g
    g.dryrun_multichip(8)
