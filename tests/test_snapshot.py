"""Full-state snapshot hooks (cam_take_snapshot_before/after role,
phys_control.F90:111-114, physpkg.F90:2788-2804): every parameterization
site records the full prognostic state (+ the site's ptend), the payload
lands on a history tape, and diffing two runs localizes an injected
perturbation to the right parameterization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.xdist_group("heavy")

from cam_nor_physics_tpu.models.coupling.camsrfexch import CamIn
from cam_nor_physics_tpu.models.physics.constituents import default_registry
from cam_nor_physics_tpu.models.physics.physics_buffer import pbuf_register
from cam_nor_physics_tpu.models.physics.physpkg import (
    _PTEND_SITES, SNAPSHOT_SITES, phys_run1, phys_run2, physpkg_pbuf_specs,
    snapshot_register)
from cam_nor_physics_tpu.models.physics.state import make_state_from_profiles
from cam_nor_physics_tpu.utils.config import PhysConfig, ZMConfig


def _setup(ncol=8, pver=16):
    reg = default_registry()
    pcnst = reg.pcnst
    eta = np.linspace(0.003, 1.0, pver + 1) ** 1.2
    pint = jnp.asarray(eta[None, :] * 1.0e5 * np.ones((ncol, 1)))
    pmid = 0.5 * (pint[:, 1:] + pint[:, :-1])
    t = jnp.maximum(300.0 * (pmid / 1.0e5) ** 0.19, 195.0).at[:, -1].add(2.0)
    q0 = (0.017 * (pmid / pmid[:, -1:]) ** 2.5 + 1e-6).at[:, -3:].multiply(1.15)
    q = jnp.zeros((ncol, pver, pcnst)).at[:, :, 0].set(q0)
    q = q.at[:, :, 1:].set(1e-8)
    st = make_state_from_profiles(pint, t, jnp.zeros((ncol, pver)),
                                  jnp.zeros((ncol, pver)), q,
                                  jnp.zeros((ncol,)))
    pbuf = pbuf_register(physpkg_pbuf_specs(ncol, pver))
    pbuf = pbuf.update(CLD=jnp.full((ncol, pver), 0.1),
                       PBLH=jnp.full((ncol,), 800.0),
                       TPERT=jnp.full((ncol,), 0.3))
    cam_in = CamIn.zeros(ncol, pcnst)
    cam_in = cam_in.replace(shf=jnp.full((ncol,), 20.0),
                            landfrac=jnp.ones((ncol,)),
                            cflx=cam_in.cflx.at[:, 0].set(5e-5))
    # every SNAPSHOT_SITE active: gray radiation + Rayleigh friction on
    pcfg = PhysConfig(cam_snapshot=True, radiation_scheme="gray",
                      raytau0=5.0)
    return reg, st, pbuf, cam_in, pcfg, ZMConfig()


def _run(setup):
    reg, st, pbuf, cam_in, pcfg, zcfg = setup
    o1 = phys_run1(pcfg, zcfg, reg, st, pbuf, cam_in, 1800.0, nstep=0)
    o2 = phys_run2(pcfg, reg, o1.state, o1.pbuf, cam_in, 1800.0)
    diags = dict(o1.diagnostics)
    diags.update(o2.diagnostics)
    return diags


class TestSnapshotPayload:
    def test_all_sites_record_full_state(self):
        setup = _setup()
        pcnst = setup[0].pcnst
        diags = _run(setup)
        for tag in SNAPSHOT_SITES:
            for f in ("T", "U", "V", "S", "PS"):
                assert f"SNAP_{tag}_{f}" in diags, (tag, f)
            for k in range(pcnst):
                assert f"SNAP_{tag}_Q{k:02d}" in diags, (tag, k)
        for tag in _PTEND_SITES:
            assert f"SNAP_{tag}_PTEND_S" in diags, tag
            assert f"SNAP_{tag}_PTEND_Q00" in diags, tag

    def test_off_by_default(self):
        reg, st, pbuf, cam_in, _, zcfg = _setup()
        o1 = phys_run1(PhysConfig(), zcfg, reg, st, pbuf, cam_in, 1800.0,
                       nstep=0)
        assert not any(k.startswith("SNAP_") for k in o1.diagnostics)


class TestSnapshotLocalization:
    def test_injected_radiation_perturbation_localized(self, monkeypatch):
        """Perturb only the radiation scheme; the first site whose 'T'
        snapshot differs between the two runs must be radiation_after —
        the offline-diffing workflow the reference's snapshot tapes
        exist for."""
        setup = _setup()
        base = _run(setup)

        from cam_nor_physics_tpu.models.physics import physpkg, radiation
        orig = radiation.radiation_tend

        def perturbed(state, cam_in, **kw):
            out = orig(state, cam_in, **kw)
            out = dict(out)
            out["qrl"] = out["qrl"] + 1e-3      # +1 mK/s-scale heating
            return out

        # physpkg imports radiation_tend inside tphysac ("from .radiation
        # import radiation_tend") — patch the source module attribute
        monkeypatch.setattr(radiation, "radiation_tend", perturbed)
        pert = _run(setup)

        first_diff = None
        for tag in SNAPSHOT_SITES:
            a = np.asarray(base[f"SNAP_{tag}_T"])
            b = np.asarray(pert[f"SNAP_{tag}_T"])
            if not np.array_equal(a, b):
                first_diff = tag
                break
        assert first_diff == "radiation_after", first_diff
        # and the recorded radiation ptend itself shows the perturbation
        ds = np.asarray(pert["SNAP_radiation_after_PTEND_S"]) - \
            np.asarray(base["SNAP_radiation_after_PTEND_S"])
        np.testing.assert_allclose(ds, 1e-3, rtol=1e-5)


class TestSnapshotTape:
    def test_payload_lands_on_tape(self, tmp_path):
        """snapshot_register declares the full payload on its own tape;
        accumulating one step and writing produces a NetCDF with the
        snapshot fields (the before/after-tape contract)."""
        from scipy.io import netcdf_file

        from cam_nor_physics_tpu.utils.histio_native import \
            AsyncHistoryWriter
        from cam_nor_physics_tpu.utils.history import (HistoryRegistry,
                                                       outfld_many)

        setup = _setup(ncol=8, pver=16)
        reg_c = setup[0]
        diags = _run(setup)
        reg = HistoryRegistry()
        snapshot_register(reg, reg_c.pcnst, tape=0)
        buf = reg.buffer(8, 16)
        buf = outfld_many(buf, diags, reg)
        lats = np.linspace(-60, 60, 2)
        lons = np.linspace(0, 270, 4)
        w = AsyncHistoryWriter(reg, lats, lons, 16)
        path = str(tmp_path / "snap.0000.nc")
        w.write(path, buf, 0.5)
        w.flush()
        w.close()
        with netcdf_file(path, mmap=False) as nc:
            names = set(nc.variables)
            for tag in SNAPSHOT_SITES:
                assert f"SNAP_{tag}_T" in names, tag
            v = np.asarray(nc.variables["SNAP_radiation_after_T"][:])
            assert np.isfinite(v).all() and v.max() > 150.0
