"""History system — cam_history equivalent (addfld / add_default / outfld).

The reference declares fields at init (`addfld` with name, grid, units),
selects per-tape defaults (`add_default`), and emits per-chunk values each
step (`outfld`), with time-averaging flags; writers produce CAM-convention
NetCDF history tapes (SURVEY §5.5).

TPU-native design: declaration stays Python-side (a registry of FieldDefs);
accumulation is a pytree of arrays safe to update inside jit (outfld is a
pure accumulate); the writer runs host-side between jitted steps and emits
NetCDF-3 classic files (scipy.io.netcdf_file — CAM-convention dimension names
lat/lon/lev/ilev/time) so standard CAM tooling can read them.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class FieldDef:
    name: str
    units: str
    long_name: str
    vdim: str = "mid"          # 'mid' | 'int' | 'srf'
    avgflag: str = "A"         # 'A' time-averaged | 'I' instantaneous


@dataclass
class HistoryRegistry:
    """addfld/add_default registry (cam_history declaration side)."""

    fields: dict = field(default_factory=dict)      # name -> FieldDef
    defaults: dict = field(default_factory=dict)    # tape -> [names]

    def addfld(self, name: str, units: str, long_name: str,
               vdim: str = "mid", avgflag: str = "A") -> None:
        if name in self.fields:
            raise ValueError(f"duplicate addfld {name!r}")
        self.fields[name] = FieldDef(name, units, long_name, vdim, avgflag)

    def add_default(self, name: str, tape: int = 0) -> None:
        if name not in self.fields:
            raise KeyError(f"add_default of undeclared field {name!r}")
        self.defaults.setdefault(tape, []).append(name)

    def buffer(self, ncol: int, pver: int, dtype=jnp.float64,
               tape: int = 0) -> dict:
        """Zeroed accumulation buffer {name: {'sum': arr, 'count': scalar}}
        for the tape's default fields — a jit-safe pytree."""
        shapes = {"mid": (ncol, pver), "int": (ncol, pver + 1),
                  "srf": (ncol,)}
        buf = {}
        for name in self.defaults.get(tape, []):
            fd = self.fields[name]
            buf[name] = {"sum": jnp.zeros(shapes[fd.vdim], dtype),
                         "count": jnp.zeros((), dtype)}
        return buf


def outfld(buf: dict, name: str, value) -> dict:
    """Accumulate one field sample (outfld role). No-op for fields not on
    the active tape, matching the reference's behavior for unrequested
    fields. Pure: returns an updated buffer."""
    if name not in buf:
        return buf
    entry = buf[name]
    new = dict(buf)
    new[name] = {"sum": entry["sum"] + value, "count": entry["count"] + 1.0}
    return new


def outfld_many(buf: dict, payload: dict) -> dict:
    """Accumulate a diagnostics dict (the per-step outfld batch)."""
    for name, value in payload.items():
        buf = outfld(buf, name, value)
    return buf


def history_resolve(registry: HistoryRegistry, buf: dict) -> dict:
    """Averaged ('A') or last-sample ('I' — sums hold one sample when the
    caller re-zeroes each step) values, host-side."""
    out = {}
    for name, entry in buf.items():
        cnt = np.maximum(np.asarray(entry["count"]), 1.0)
        fd = registry.fields[name]
        val = np.asarray(entry["sum"])
        out[name] = val / cnt if fd.avgflag == "A" else val
    return out


def write_history_netcdf(path: str, registry: HistoryRegistry, buf: dict,
                         lats: np.ndarray, lons: np.ndarray, pver: int,
                         time_days: float) -> None:
    """Write one CAM-convention NetCDF-3 history tape (cam_history writer
    role). Column batch is unflattened to (time, [lev,] lat, lon)."""
    from scipy.io import netcdf_file
    jm, im = len(lats), len(lons)
    vals = history_resolve(registry, buf)
    with netcdf_file(path, "w") as nc:
        nc.createDimension("time", None)
        nc.createDimension("lat", jm)
        nc.createDimension("lon", im)
        nc.createDimension("lev", pver)
        nc.createDimension("ilev", pver + 1)
        vtime = nc.createVariable("time", "d", ("time",))
        vtime.units = b"days since 0001-01-01 00:00:00"
        vlat = nc.createVariable("lat", "d", ("lat",))
        vlat.units = b"degrees_north"
        vlat[:] = np.degrees(lats)
        vlon = nc.createVariable("lon", "d", ("lon",))
        vlon.units = b"degrees_east"
        vlon[:] = np.degrees(lons)
        vtime[0] = time_days
        for name, val in vals.items():
            fd = registry.fields[name]
            if fd.vdim == "srf":
                v = nc.createVariable(name, "f", ("time", "lat", "lon"))
                v[0] = val.reshape(jm, im).astype(np.float32)
            else:
                dim = "lev" if fd.vdim == "mid" else "ilev"
                nk = pver if fd.vdim == "mid" else pver + 1
                v = nc.createVariable(name, "f", ("time", dim, "lat", "lon"))
                v[0] = val.T.reshape(nk, jm, im).astype(np.float32)
            v.units = fd.units.encode()
            v.long_name = fd.long_name.encode()


def default_registry_atm() -> HistoryRegistry:
    """The baseline field set the driver emits (subset of the reference's
    ~hundreds of addflds: dyn state dyn_comp.F90:676-712; ZM set
    zm_conv_intr.F90:677-858; diag_phys_writeout families)."""
    r = HistoryRegistry()
    r.addfld("T", "K", "Temperature")
    r.addfld("U", "m/s", "Zonal wind")
    r.addfld("V", "m/s", "Meridional wind")
    r.addfld("Q", "kg/kg", "Specific humidity")
    r.addfld("PS", "Pa", "Surface pressure", vdim="srf")
    r.addfld("OMEGA", "Pa/s", "Vertical pressure velocity")
    r.addfld("Z3", "m", "Geopotential height")
    r.addfld("CAPE", "J/kg", "Convectively available potential energy",
             vdim="srf")
    r.addfld("FREQZM", "fraction", "Fractional occurrence of ZM convection",
             vdim="srf")
    r.addfld("PRECC", "m/s", "Convective precipitation rate", vdim="srf")
    r.addfld("ZMDT", "K/s", "T tendency - Zhang-McFarlane convection")
    r.addfld("ZMDQ", "kg/kg/s", "Q tendency - Zhang-McFarlane convection")
    r.addfld("CMFMC", "kg/m2/s", "Total convective mass flux", vdim="int")
    r.addfld("CLDTOP", "level", "Convective cloud top level", vdim="srf")
    r.addfld("CLDBOT", "level", "Convective cloud bottom level", vdim="srf")
    for name in ["T", "U", "V", "Q", "PS", "CAPE", "PRECC", "ZMDT", "ZMDQ",
                 "CMFMC", "FREQZM"]:
        r.add_default(name)
    return r
