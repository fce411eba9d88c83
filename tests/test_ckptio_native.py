"""Native async checkpoint writer: build, np.load round trip, restart
compatibility with restore_checkpoint, async semantics."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cam_nor_physics_tpu.utils.checkpoint import restore_checkpoint
from cam_nor_physics_tpu.utils.ckptio_native import (AsyncCheckpointWriter,
                                                     build_native)


@pytest.fixture(scope="module")
def state():
    return {"u": jnp.arange(24.0, dtype=jnp.float32).reshape(2, 3, 4),
            "q": jnp.linspace(0, 1, 7),
            "nstep": jnp.asarray(5)}


class TestNativeCkptIO:
    def test_builds(self):
        assert build_native()

    def test_round_trip_native(self, state, tmp_path):
        w = AsyncCheckpointWriter()
        assert w.native
        p = str(tmp_path / "ck")
        w.write(p, state, {"nstep": 5})
        w.flush()
        template = jax.tree.map(jnp.zeros_like, state)
        out = restore_checkpoint(p, template)
        for a, b in zip(jax.tree.leaves(out), jax.tree.leaves(state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        w.close()

    def test_many_async_writes_all_land(self, state, tmp_path):
        w = AsyncCheckpointWriter()
        paths = [str(tmp_path / f"ck{i}") for i in range(6)]
        for p in paths:
            w.write(p, state)
        w.flush()
        assert w.pending() == 0
        for p in paths:
            z = np.load(os.path.join(p, "state.npz"))
            assert len(z.files) == 3
        w.close()

    def test_fallback_matches(self, state, tmp_path):
        w = AsyncCheckpointWriter(try_native=False)
        assert not w.native
        p = str(tmp_path / "ck")
        w.write(p, state)
        template = jax.tree.map(jnp.zeros_like, state)
        out = restore_checkpoint(p, template)
        np.testing.assert_array_equal(np.asarray(out["u"]),
                                      np.asarray(state["u"]))
