"""Numeric guards (utils/debug.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import reference_deck

from radiative_transfer_tpu.config.config import load_config
from radiative_transfer_tpu.models import transport
from radiative_transfer_tpu.utils import debug as dbg


def _setup(**over):
    cfg = load_config(reference_deck("single_group.prm"), **over)
    tables, _, _ = transport.build_tables(cfg)
    state = transport.initial_state(cfg, tables)
    return cfg, tables, state


def test_checked_step_passes_on_healthy_state():
    cfg, tables, state = _setup(max_timesteps=1)
    step = transport.make_step_fn(cfg, tables)
    err, new = jax.jit(dbg.checked_step(step))(state)
    err.throw()  # no error
    assert np.all(np.isfinite(np.asarray(new.ends)))


def test_checked_step_catches_nan():
    cfg, tables, state = _setup(max_timesteps=1)
    step = transport.make_step_fn(cfg, tables)
    poisoned = state._replace(
        ends=state.ends.at[0, 0, 0, 0].set(jnp.nan)
    )
    err, _ = jax.jit(dbg.checked_step(step))(poisoned)
    with pytest.raises(Exception, match="non-finite"):
        err.throw()


def test_checked_step_positivity():
    cfg, tables, state = _setup(max_timesteps=1)
    step = transport.make_step_fn(cfg, tables)
    err, new = jax.jit(dbg.checked_step(step, positivity=True))(state)
    err.throw()  # equilibrium state stays positive
    assert np.all(np.asarray(new.ends) > 0)


def test_assert_state_finite():
    cfg, tables, state = _setup(max_timesteps=1)
    dbg.assert_state_finite(state)  # fine
    poisoned = state._replace(
        prev_ends=state.prev_ends.at[0, 0, 0, 0].set(jnp.inf)
    )
    with pytest.raises(FloatingPointError, match="prev_ends"):
        dbg.assert_state_finite(poisoned)


def test_nan_debug_context_restores():
    prev = jax.config.jax_debug_nans
    with dbg.nan_debug():
        assert jax.config.jax_debug_nans is True
    assert jax.config.jax_debug_nans == prev
