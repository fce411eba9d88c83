"""Sharding tests: resident-layout equivalence (the reference's stated
decomposition-invariance property, SURVEY §4) and polar-filter impl parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cam_nor_physics_tpu.models.fv.dyn_comp import dyn_run
from cam_nor_physics_tpu.models.fv.grid import (circulant_filter_matrices,
                                                make_grid, polar_filter,
                                                polar_filter_matmul)
from cam_nor_physics_tpu.models.fv.held_suarez import (hs_forcing,
                                                       hs_initial_state)
from cam_nor_physics_tpu.models.fv.vertical import hybrid_coefficients
from cam_nor_physics_tpu.parallel.mesh import (constrain, make_mesh,
                                               shard_state)
from cam_nor_physics_tpu.utils.config import FVConfig


def test_polar_filter_matmul_matches_fft():
    grid = make_grid(48, 25, 3)
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((3, 25, 48)))
    ref = polar_filter(a, jnp.asarray(grid.pft_center))
    circ = jnp.asarray(circulant_filter_matrices(grid.pft_center))
    got = polar_filter_matmul(a, circ)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-12)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestShardedStep:
    def _step_pair(self, filter_impl):
        im, jm, km = 32, 24, 4
        grid = make_grid(im, jm, km)
        coord = hybrid_coefficients(km)
        phis = jnp.zeros((jm, im))
        cfg = FVConfig(nsplit=2, nspltrac=1)
        st = hs_initial_state(grid, coord, pert=1.0)

        def step(s):
            s = dyn_run(s, grid, coord, phis, cfg, 1800.0,
                        filter_impl=filter_impl)
            return hs_forcing(s, grid, coord.ptop, 1800.0)

        return step, st

    def test_sharded_matches_single_device(self):
        """1-chip vs 8-chip answers must agree (decomposition invariance)."""
        step, st = self._step_pair("matmul")
        ref = jax.jit(step)(st)

        mesh = make_mesh(8, x_shards=2)
        st_sh = shard_state(st, mesh)
        sharded = jax.jit(lambda s: constrain(step(s), mesh))(st_sh)
        for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(sharded)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-12, atol=1e-12)

    def test_dryrun_multichip(self):
        import sys
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as g
        g.dryrun_multichip(8)

    def test_coupled_step_sharded_matches(self):
        """The FULL coupled step (physics + coupling + dynamics) must be
        decomposition-invariant: 8-way y-sharded vs single device."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from cam_nor_physics_tpu.models.atm_comp import (AtmModel, atm_init,
                                                         atm_step)
        from cam_nor_physics_tpu.models.coupling.camsrfexch import CamIn
        from cam_nor_physics_tpu.parallel.mesh import make_mesh

        jm, im, km = 24, 32, 4
        model = AtmModel.create(im, jm, km, dt=1800.0,
                                fv_cfg=FVConfig(nsplit=2, nspltrac=1),
                                filter_impl="matmul")
        dyn0 = hs_initial_state(model.grid, model.coord, pert=0.0,
                                nq=model.registry.pcnst)
        dyn0 = dyn0.replace(q=jnp.full_like(dyn0.q, 1e-4).at[0].set(
            3e-3 * (dyn0.delp / dyn0.delp.max())))
        state = atm_init(model, dyn0, jnp.zeros((jm, im)))
        ncol = jm * im
        cam_in = CamIn.zeros(ncol, model.registry.pcnst)
        cam_in = cam_in.replace(shf=jnp.full((ncol,), 10.0),
                                landfrac=jnp.full((ncol,), 0.3))

        ref, _, _ = jax.jit(
            lambda s: atm_step(model, s, cam_in, first_step=True))(state)

        mesh = make_mesh(8, x_shards=1)

        def spec(a):
            if a.ndim >= 2 and a.shape[-2] == jm and a.shape[-1] == im:
                return P(*([None] * (a.ndim - 2)), 'y', None)
            if a.ndim >= 1 and a.shape[0] == ncol:
                return P('y')
            return P()

        def place(tree):
            return jax.tree.map(
                lambda a: jax.device_put(a, NamedSharding(mesh, spec(a))),
                tree)

        out, _, _ = jax.jit(
            lambda s, ci: atm_step(model, s, ci, first_step=True))(
            place(state), place(cam_in))
        for name in ["u", "v", "pt", "delp", "q"]:
            a = np.asarray(getattr(ref.dyn, name))
            b = np.asarray(getattr(out.dyn, name))
            scale = max(np.abs(a).max(), 1.0)
            assert np.abs(a - b).max() < 1e-11 * scale, name
        np.testing.assert_allclose(np.asarray(out.phys.t),
                                   np.asarray(ref.phys.t), atol=1e-10)


class TestShardedPallasStencils:
    """shard_map Pallas transport path (parallel/shard_stencil.py) vs the
    single-device XLA path, on 8 virtual CPU devices with interpret-mode
    kernels: halo exchange via ppermute + per-strip fused kernels + the
    jnp polar patch must reproduce the whole-array results."""

    def _mesh(self):
        return make_mesh(8, x_shards=1)

    def test_sharded_transport3d_matches(self, monkeypatch):
        from cam_nor_physics_tpu.ops import pallas_kernels as pk
        from cam_nor_physics_tpu.ops import tp_core as tp2
        from cam_nor_physics_tpu.parallel import shard_stencil as ss
        monkeypatch.setattr(pk, "_INTERPRET", True)
        mesh = self._mesh()
        assert ss.use_sharded_pallas(mesh)
        im, jm, km = 72, 64, 4
        g = make_grid(im, jm, km)
        rng = np.random.default_rng(3)
        f64 = jnp.float64
        delp = jnp.asarray(1e3 + 50 * rng.standard_normal((km, jm, im)), f64)
        pt = jnp.asarray(300 + 30 * rng.standard_normal((km, jm, im)), f64)
        crx = jnp.asarray(0.6 * rng.standard_normal((km, jm, im)), f64)
        crx = crx.at[:, :3].mul(3.0).at[:, -3:].mul(3.0)
        cry = tp2.wset_row(
            jnp.asarray(0.4 * rng.standard_normal((km, jm, im)), f64), 0, 0.0)
        cosp = jnp.asarray(g.cosp, f64)
        acosp = jnp.asarray(g.acosp, f64)
        yfx = cry * jnp.asarray(g.cose, f64)[:, None]
        va = 0.5 * (cry + tp2.edge_north(cry))
        ffsl = jnp.max(jnp.abs(crx), axis=-1) > 1.0

        ref = ss._transport_level_jnp(delp, pt, crx, cry, yfx, va, ffsl,
                                      cosp, acosp, g.rcap, 4, 4)
        got = jax.jit(lambda *a: ss.sharded_transport3d(
            mesh, *a, g.rcap, 4, 4))(delp, pt, crx, cry, yfx, va, ffsl,
                                     cosp, acosp)
        for n, (x, y) in zip(("ddp", "dpt", "mfx", "mfy"), zip(got, ref)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-12, atol=1e-12, err_msg=n)

    def test_sharded_dyn_run_matches(self, monkeypatch):
        """Full dyn_run with mesh= (sharded Pallas transport + tracer path)
        vs the single-device XLA path."""
        from cam_nor_physics_tpu.ops import pallas_kernels as pk
        monkeypatch.setattr(pk, "_INTERPRET", True)
        mesh = self._mesh()
        im, jm, km = 48, 64, 4
        g = make_grid(im, jm, km)
        coord = hybrid_coefficients(km)
        phis = jnp.zeros((jm, im), jnp.float64)
        cfg = FVConfig(nsplit=2, nspltrac=1)
        st = hs_initial_state(g, coord, pert=1.0, dtype=jnp.float64)

        ref = jax.jit(lambda s: dyn_run(s, g, coord, phis, cfg, 1800.0,
                                        filter_impl="matmul"))(st)
        st_sh = shard_state(st, mesh)
        got = jax.jit(lambda s: constrain(
            dyn_run(s, g, coord, phis, cfg, 1800.0, filter_impl="matmul",
                    mesh=mesh), mesh))(st_sh)
        for n in ("u", "v", "pt", "delp", "q"):
            a = np.asarray(getattr(got, n))
            b = np.asarray(getattr(ref, n))
            np.testing.assert_allclose(a, b, rtol=1e-10,
                                       atol=1e-10 * max(np.abs(b).max(),
                                                        1e-12), err_msg=n)
