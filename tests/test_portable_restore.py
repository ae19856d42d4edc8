"""Platform-portable checkpoint restore (round-4 VERDICT item 4).

The committed full13 continuation checkpoint was saved on the TPU; this
orbax version's default restore consults the checkpoint's saved device
shardings and fails off-chip ("Device TPU v5 lite0 was not found" — the
failure documented in evidence/ckpt_full13_transformer_b_s_w/RESUME.md).
Both restore paths must now work cross-backend:

  * ``restore_checkpoint`` converts the caller's template to an abstract
    target carrying the TEMPLATE's (local) shardings;
  * ``restore_checkpoint_portable`` needs no template at all — it builds
    the target from the checkpoint's own array metadata and places every
    leaf on the local backend.

These tests run on the CPU test backend against the committed TPU-saved
artifact, which is exactly the cross-platform case.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from rl_selfplay_mnk_tpu.utils.checkpoint import (
    restore_checkpoint,
    restore_checkpoint_portable,
    save_checkpoint,
)

EVIDENCE_CKPT = os.path.join(
    os.path.dirname(__file__), "..", "evidence", "ckpt_full13_transformer_b_s_w"
)


def test_portable_restore_of_committed_tpu_checkpoint():
    """The TPU-saved iteration-4350 train state restores in this CPU-only
    process: full leaf count, finite parameters, local placement."""
    state, step = restore_checkpoint_portable(EVIDENCE_CKPT)
    assert step == 4350
    leaves = jax.tree.leaves(state)
    assert len(leaves) == 806
    assert int(np.asarray(state["iteration"])) == 4350
    params = jax.tree.leaves(state["params"])
    assert len(params) == 33
    for p in params:
        assert bool(jnp.isfinite(p).all())
        assert all(d.platform == "cpu" for d in p.devices())
    # the rest of the train state came along: optimizer state, pool,
    # benchmark, RNG streams, mid-episode env state
    for key in ("opt_state", "pool", "benchmark", "rng", "sp_state", "obs"):
        assert key in state, key


def test_portable_restore_missing_dir_returns_none(tmp_path):
    state, step = restore_checkpoint_portable(str(tmp_path / "nope"))
    assert state is None and step is None


def test_template_restore_roundtrip_still_exact(tmp_path):
    """The abstract-template conversion inside restore_checkpoint must not
    change ordinary same-backend restores (regression guard for the
    cross-backend fix)."""
    state = {
        "params": {"w": jnp.linspace(-1, 1, 12).reshape(3, 4)},
        "count": jnp.arange(5, dtype=jnp.int32),
        "iteration": 7,
    }
    save_checkpoint(str(tmp_path / "ck"), 7, state)
    template = jax.tree.map(
        lambda x: jnp.zeros_like(x) if isinstance(x, jax.Array) else 0, state
    )
    restored, step = restore_checkpoint(str(tmp_path / "ck"), template)
    assert step == 7
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.asarray(state["params"]["w"])
    )
    np.testing.assert_array_equal(
        np.asarray(restored["count"]), np.asarray(state["count"])
    )
    assert int(restored["iteration"]) == 7
