"""utils/runtime capability gates."""
import os

from cam_nor_physics_tpu.utils.runtime import donation_ok


def test_donation_blocked_on_axon_tunnel(monkeypatch):
    monkeypatch.setitem(os.environ, "JAX_PLATFORMS", "axon")
    monkeypatch.delitem(os.environ, "CAM_FORCE_DONATE", raising=False)
    monkeypatch.delitem(os.environ, "CAM_NO_DONATE", raising=False)
    assert not donation_ok()
    monkeypatch.setitem(os.environ, "CAM_FORCE_DONATE", "1")
    assert donation_ok()


def test_donation_ok_elsewhere(monkeypatch):
    monkeypatch.setitem(os.environ, "JAX_PLATFORMS", "cpu")
    monkeypatch.delitem(os.environ, "CAM_FORCE_DONATE", raising=False)
    monkeypatch.delitem(os.environ, "CAM_NO_DONATE", raising=False)
    assert donation_ok()
    monkeypatch.setitem(os.environ, "CAM_NO_DONATE", "1")
    assert not donation_ok()
