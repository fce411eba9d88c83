"""History system — cam_history equivalent (addfld / add_default / outfld).

The reference declares fields at init (`addfld` with name, grid, units),
selects per-tape defaults (`add_default`), and emits per-chunk values each
step (`outfld`), with time-averaging flags; writers produce CAM-convention
NetCDF history tapes (SURVEY §5.5). Staggered-grid declarations (US/VS on
the FV u/v staggers, dyn_comp.F90:676-712) and the avgflag set
A/I/X/M (average, instantaneous, max, min) follow cam_history semantics.

TPU-native design: declaration stays Python-side (a registry of FieldDefs);
accumulation is a pytree of arrays safe to update inside jit (outfld is a
pure accumulate); the writer runs host-side between jitted steps and emits
NetCDF-3 classic files (scipy.io.netcdf_file — CAM-convention dimension names
lat/lon/slat/slon/lev/ilev/time) so standard CAM tooling can read them.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

_AVGFLAGS = ("A", "I", "X", "M")
_GRIDS = ("fv_centers", "fv_u_stagger", "fv_v_stagger")


@dataclass(frozen=True)
class FieldDef:
    name: str
    units: str
    long_name: str
    vdim: str = "mid"          # 'mid' | 'int' | 'srf'
    avgflag: str = "A"         # 'A' averaged | 'I' instant | 'X' max | 'M' min
    gridname: str = "fv_centers"   # 'fv_centers' | 'fv_u_stagger' | 'fv_v_stagger'


@dataclass
class HistoryRegistry:
    """addfld/add_default registry (cam_history declaration side)."""

    fields: dict = field(default_factory=dict)      # name -> FieldDef
    defaults: dict = field(default_factory=dict)    # tape -> [names]

    def addfld(self, name: str, units: str, long_name: str,
               vdim: str = "mid", avgflag: str = "A",
               gridname: str = "fv_centers") -> None:
        if name in self.fields:
            raise ValueError(f"duplicate addfld {name!r}")
        if avgflag not in _AVGFLAGS:
            raise ValueError(f"avgflag {avgflag!r} not one of {_AVGFLAGS}")
        if gridname not in _GRIDS:
            raise ValueError(f"gridname {gridname!r} not one of {_GRIDS}")
        self.fields[name] = FieldDef(name, units, long_name, vdim, avgflag,
                                     gridname)

    def add_default(self, name: str, tape: int = 0) -> None:
        if name not in self.fields:
            raise KeyError(f"add_default of undeclared field {name!r}")
        self.defaults.setdefault(tape, []).append(name)

    def buffer(self, ncol: int, pver: int, dtype=jnp.float64,
               tape: int = 0, jm: int | None = None,
               im: int | None = None) -> dict:
        """Zeroed accumulation buffer {name: {'sum': arr, 'count': scalar}}
        for the tape's default fields — a jit-safe pytree. Staggered-grid
        fields are buffered in native (pver, rows, im) layout and need
        jm/im; center-grid fields use flat (ncol, ...) columns. 'X'/'M'
        buffers start at -inf/+inf so the first sample wins."""
        shapes = {"mid": (ncol, pver), "int": (ncol, pver + 1),
                  "srf": (ncol,)}
        buf = {}
        for name in self.defaults.get(tape, []):
            fd = self.fields[name]
            if fd.gridname == "fv_centers":
                shape = shapes[fd.vdim]
            else:
                if jm is None or im is None:
                    raise ValueError(
                        f"buffer() needs jm/im for staggered field {name!r}")
                rows = jm - 1 if fd.gridname == "fv_u_stagger" else jm
                shape = (pver, rows, im)
            init = {"A": 0.0, "I": 0.0, "X": -jnp.inf, "M": jnp.inf}[fd.avgflag]
            buf[name] = {"sum": jnp.full(shape, init, dtype),
                         "count": jnp.zeros((), dtype)}
        return buf


def _accumulate(entry: dict, value, avgflag: str) -> dict:
    if avgflag == "A":
        new_sum = entry["sum"] + value
    elif avgflag == "I":
        new_sum = jnp.asarray(value, entry["sum"].dtype)
    elif avgflag == "X":
        new_sum = jnp.maximum(entry["sum"], value)
    else:                                            # 'M'
        new_sum = jnp.minimum(entry["sum"], value)
    return {"sum": new_sum, "count": entry["count"] + 1.0}


def outfld(buf: dict, name: str, value, registry: HistoryRegistry = None) -> dict:
    """Accumulate one field sample (outfld role). No-op for fields not on
    the active tape, matching the reference's behavior for unrequested
    fields. Pure: returns an updated buffer. Without a registry the field
    is treated as time-averaged ('A')."""
    if name not in buf:
        return buf
    avgflag = registry.fields[name].avgflag if registry is not None else "A"
    new = dict(buf)
    new[name] = _accumulate(buf[name], value, avgflag)
    return new


def outfld_many(buf: dict, payload: dict,
                registry: HistoryRegistry = None) -> dict:
    """Accumulate a diagnostics dict (the per-step outfld batch)."""
    for name, value in payload.items():
        buf = outfld(buf, name, value, registry)
    return buf


def history_resolve(registry: HistoryRegistry, buf: dict) -> dict:
    """Resolved values per avgflag: 'A' mean over samples, 'I' last sample,
    'X'/'M' running extreme. Host-side. Never-sampled fields resolve to 0."""
    out = {}
    for name, entry in buf.items():
        cnt = np.asarray(entry["count"])
        fd = registry.fields[name]
        val = np.asarray(entry["sum"])
        if fd.avgflag == "A":
            out[name] = val / np.maximum(cnt, 1.0)
        elif cnt == 0.0:
            out[name] = np.zeros_like(val)
        else:
            out[name] = val
    return out


def stagger_coords(lats: np.ndarray, lons: np.ndarray):
    """FV staggered coordinates: slat = interior interface latitudes
    (jm-1 midpoints), slon = west-edge longitudes (lon - dl/2)."""
    slat = 0.5 * (np.asarray(lats)[:-1] + np.asarray(lats)[1:])
    lons = np.asarray(lons)
    dl = lons[1] - lons[0] if len(lons) > 1 else 0.0
    slon = lons - 0.5 * dl
    return slat, slon


def _field_shape(fd: FieldDef, jm: int, im: int, pver: int):
    """(dims, shape) of one resolved field in the tape file."""
    if fd.gridname == "fv_u_stagger":
        return ("time", "lev", "slat", "lon"), (pver, jm - 1, im)
    if fd.gridname == "fv_v_stagger":
        return ("time", "lev", "lat", "slon"), (pver, jm, im)
    if fd.vdim == "srf":
        return ("time", "lat", "lon"), (jm, im)
    dim = "lev" if fd.vdim == "mid" else "ilev"
    nk = pver if fd.vdim == "mid" else pver + 1
    return ("time", dim, "lat", "lon"), (nk, jm, im)


def write_history_netcdf(path: str, registry: HistoryRegistry, buf: dict,
                         lats: np.ndarray, lons: np.ndarray, pver: int,
                         time_days: float) -> None:
    """Write one CAM-convention NetCDF-3 history tape (cam_history writer
    role). Center-grid column batches are unflattened to
    (time, [lev,] lat, lon); staggered fields keep their native layout."""
    from scipy.io import netcdf_file
    jm, im = len(lats), len(lons)
    vals = history_resolve(registry, buf)
    slat, slon = stagger_coords(lats, lons)
    with netcdf_file(path, "w") as nc:
        nc.createDimension("time", None)
        nc.createDimension("lat", jm)
        nc.createDimension("lon", im)
        nc.createDimension("slat", jm - 1)
        nc.createDimension("slon", im)
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
        vslat = nc.createVariable("slat", "d", ("slat",))
        vslat.units = b"degrees_north"
        vslat[:] = np.degrees(slat)
        vslon = nc.createVariable("slon", "d", ("slon",))
        vslon.units = b"degrees_east"
        vslon[:] = np.degrees(slon)
        vtime[0] = time_days
        for name, val in vals.items():
            fd = registry.fields[name]
            dims, shape = _field_shape(fd, jm, im, pver)
            v = nc.createVariable(name, "f", dims)
            if fd.gridname == "fv_centers" and fd.vdim != "srf":
                val = val.T           # (ncol, k) -> (k, ncol)
            v[0] = val.reshape(shape).astype(np.float32)
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
    r.addfld("US", "m/s", "Zonal wind, staggered", gridname="fv_u_stagger")
    r.addfld("VS", "m/s", "Meridional wind, staggered",
             gridname="fv_v_stagger")
    r.addfld("Q", "kg/kg", "Specific humidity")
    r.addfld("PS", "Pa", "Surface pressure", vdim="srf")
    r.addfld("OMEGA", "Pa/s", "Vertical pressure velocity")
    r.addfld("Z3", "m", "Geopotential height")
    r.addfld("CAPE", "J/kg", "Convectively available potential energy",
             vdim="srf")
    r.addfld("FREQZM", "fraction", "Fractional occurrence of ZM convection",
             vdim="srf")
    r.addfld("PRECC", "m/s", "Convective precipitation rate", vdim="srf")
    r.addfld("PRECCMX", "m/s", "Max convective precipitation rate",
             vdim="srf", avgflag="X")
    r.addfld("ZMDT", "K/s", "T tendency - Zhang-McFarlane convection")
    r.addfld("ZMDQ", "kg/kg/s", "Q tendency - Zhang-McFarlane convection")
    r.addfld("CMFMC", "kg/m2/s", "Total convective mass flux", vdim="int")
    r.addfld("CLDTOP", "level", "Convective cloud top level", vdim="srf")
    r.addfld("CLDBOT", "level", "Convective cloud bottom level", vdim="srf")
    for name in ["T", "U", "V", "Q", "PS", "CAPE", "PRECC", "ZMDT", "ZMDQ",
                 "CMFMC", "FREQZM"]:
        r.add_default(name)
    return r
