"""WPS-style map projection math, vectorized over whole index arrays.

Replaces the reference's ``module_map_utils.F90`` + ``llxy_module.F90``.
Where the reference computes every grid point with a scalar subroutine call
inside a double loop (``model_grid.F90:2212-2217``), everything here is a
single broadcast expression over (ny, nx) index arrays in float64 on the
host — grid construction is one-time setup work; the TPU owns the per-field
hot path (see ops/apply.py).

Supported projections (the namelist-selectable set, ``program_setup.F90:169-192``):
Lambert conformal (``module_map_utils.F90:1083-1290``), polar stereographic
(``:682-822``), Mercator (``:1293-1362``), cylindrical lat-lon (``:1365-1428``).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..constants import (
    DEG_PER_RAD,
    EARTH_RADIUS_M,
    M,
    PROJ_LATLON,
    PROJ_LC,
    PROJ_MERC,
    PROJ_PS,
    RAD_PER_DEG,
    U,
    V,
    CORNER,
)


@dataclasses.dataclass(frozen=True)
class ProjInfo:
    """Projection parameters (cf. proj_info, module_map_utils.F90:140-192)."""

    code: int
    lat1: float = -999.9      # known-point latitude
    lon1: float = -999.9      # known-point longitude
    dx: float = -999.9        # grid spacing (m) at truelats
    latinc: float = -999.9    # lat-lon grids only (deg)
    loninc: float = -999.9
    stdlon: float = -999.9
    truelat1: float = -999.9
    truelat2: float = -999.9
    knowni: float = -999.9    # i of known point
    knownj: float = -999.9
    re_m: float = EARTH_RADIUS_M
    nxmin: int = 1            # lat-lon periodic wrap bounds
    nxmax: int = 43200
    # derived
    hemi: float = 1.0
    cone: float = -999.9
    polei: float = -999.9
    polej: float = -999.9
    rsw: float = -999.9
    rebydx: float = -999.9
    dlon_merc: float = -999.9


def lc_cone(truelat1: float, truelat2: float) -> float:
    """Cone factor of a Lambert conformal projection (module_map_utils.F90:1124-1157)."""
    if abs(truelat1 - truelat2) > 0.1:
        return (
            np.log10(np.cos(truelat1 * RAD_PER_DEG))
            - np.log10(np.cos(truelat2 * RAD_PER_DEG))
        ) / (
            np.log10(np.tan((45.0 - abs(truelat1) / 2.0) * RAD_PER_DEG))
            - np.log10(np.tan((45.0 - abs(truelat2) / 2.0) * RAD_PER_DEG))
        )
    return np.sin(abs(truelat1) * RAD_PER_DEG)


def _wrap_lon(lon):
    lon = np.where(lon > 180.0, lon - 360.0, lon)
    lon = np.where(lon < -180.0, lon + 360.0, lon)
    return lon


def make_proj(
    code: int,
    *,
    lat1: float = -999.9,
    lon1: float = -999.9,
    knowni: float = -999.9,
    knownj: float = -999.9,
    dx: float = -999.9,
    latinc: float = -999.9,
    loninc: float = -999.9,
    stdlon: float = -999.9,
    truelat1: float = -999.9,
    truelat2: float = -999.9,
    nxmax: int = 43200,
    re_m: float = EARTH_RADIUS_M,
) -> ProjInfo:
    """map_set equivalent (module_map_utils.F90:243-567): validates and
    precomputes pole location / cone / radii."""
    lon1 = float(_wrap_lon(np.float64(lon1))) if lon1 != -999.9 else lon1
    stdlon = float(_wrap_lon(np.float64(stdlon))) if stdlon != -999.9 else stdlon
    if truelat2 != -999.9 and abs(truelat2) > 90.0:
        truelat2 = truelat1
    hemi = -1.0 if (truelat1 != -999.9 and truelat1 < 0.0) else 1.0
    rebydx = re_m / dx if dx > 0 else -999.9
    cone = polei = polej = rsw = dlon_merc = -999.9

    if code == PROJ_LC:
        # set_lc (module_map_utils.F90:1083-1121)
        cone = float(lc_cone(truelat1, truelat2))
        deltalon1 = float(_wrap_lon(np.float64(lon1 - stdlon)))
        ctl1r = np.cos(truelat1 * RAD_PER_DEG)
        rsw = (
            rebydx
            * ctl1r
            / cone
            * (
                np.tan((90.0 * hemi - lat1) * RAD_PER_DEG / 2.0)
                / np.tan((90.0 * hemi - truelat1) * RAD_PER_DEG / 2.0)
            )
            ** cone
        )
        arg = cone * (deltalon1 * RAD_PER_DEG)
        polei = hemi * knowni - hemi * rsw * np.sin(arg)
        polej = hemi * knownj + rsw * np.cos(arg)
    elif code == PROJ_PS:
        # set_ps (module_map_utils.F90:682-715)
        reflon = stdlon + 90.0
        scale_top = 1.0 + hemi * np.sin(truelat1 * RAD_PER_DEG)
        ala1 = lat1 * RAD_PER_DEG
        rsw = rebydx * np.cos(ala1) * scale_top / (1.0 + hemi * np.sin(ala1))
        alo1 = (lon1 - reflon) * RAD_PER_DEG
        polei = knowni - rsw * np.cos(alo1)
        polej = knownj - hemi * rsw * np.sin(alo1)
    elif code == PROJ_MERC:
        # set_merc (module_map_utils.F90:1293-1317)
        clain = np.cos(RAD_PER_DEG * truelat1)
        dlon_merc = dx / (re_m * clain)
        rsw = 0.0
        if lat1 != 0.0:
            rsw = np.log(np.tan(0.5 * ((lat1 + 90.0) * RAD_PER_DEG))) / dlon_merc
    elif code == PROJ_LATLON:
        pass
    else:
        raise ValueError(f"unsupported projection code {code}")

    return ProjInfo(
        code=code, lat1=lat1, lon1=lon1, dx=dx, latinc=latinc, loninc=loninc,
        stdlon=stdlon, truelat1=truelat1, truelat2=truelat2, knowni=knowni,
        knownj=knownj, re_m=re_m, nxmax=nxmax, hemi=hemi, cone=float(cone),
        polei=float(polei), polej=float(polej), rsw=float(rsw),
        rebydx=float(rebydx), dlon_merc=float(dlon_merc),
    )


def proj_from_config(cfg) -> ProjInfo:
    """push_source_projection equivalent (llxy_module.F90:38-159)."""
    code = cfg.proj_code
    if code == PROJ_LATLON:
        return make_proj(
            code,
            lat1=cfg.known_lat, lon1=cfg.known_lon,
            knowni=cfg.known_x, knownj=cfg.known_y,
            latinc=cfg.dlatdeg, loninc=cfg.dlondeg,
            nxmax=int(round(360.0 / cfg.dlondeg)),
        )
    if code == PROJ_MERC:
        return make_proj(
            code, truelat1=cfg.truelat1,
            lat1=cfg.known_lat, lon1=cfg.known_lon,
            knowni=cfg.known_x, knownj=cfg.known_y, dx=cfg.dxkm,
        )
    if code in (PROJ_LC, PROJ_PS):
        return make_proj(
            code, truelat1=cfg.truelat1, truelat2=cfg.truelat2,
            stdlon=cfg.stand_lon,
            lat1=cfg.known_lat, lon1=cfg.known_lon,
            knowni=cfg.known_x, knownj=cfg.known_y, dx=cfg.dxkm,
        )
    raise ValueError(f"unsupported projection code {code}")


# ---------------------------------------------------------------------------
# (i, j) -> (lat, lon) — vectorized ij_to_latlon (module_map_utils.F90:629-679)
# ---------------------------------------------------------------------------

def ij_to_latlon(proj: ProjInfo, i, j):
    i = np.asarray(i, dtype=np.float64)
    j = np.asarray(j, dtype=np.float64)
    if proj.code == PROJ_LATLON:
        return _ijll_latlon(proj, i, j)
    if proj.code == PROJ_LC:
        return _ijll_lc(proj, i, j)
    if proj.code == PROJ_PS:
        return _ijll_ps(proj, i, j)
    if proj.code == PROJ_MERC:
        return _ijll_merc(proj, i, j)
    raise ValueError(f"unsupported projection code {proj.code}")


def latlon_to_ij(proj: ProjInfo, lat, lon):
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    if proj.code == PROJ_LATLON:
        return _llij_latlon(proj, lat, lon)
    if proj.code == PROJ_LC:
        return _llij_lc(proj, lat, lon)
    if proj.code == PROJ_PS:
        return _llij_ps(proj, lat, lon)
    if proj.code == PROJ_MERC:
        return _llij_merc(proj, lat, lon)
    raise ValueError(f"unsupported projection code {proj.code}")


def _ijll_lc(proj, i, j):
    """module_map_utils.F90:1160-1233 (ijll_lc)."""
    chi1 = (90.0 - proj.hemi * proj.truelat1) * RAD_PER_DEG
    chi2 = (90.0 - proj.hemi * proj.truelat2) * RAD_PER_DEG
    inew = proj.hemi * i
    jnew = proj.hemi * j
    xx = inew - proj.polei
    yy = proj.polej - jnew
    r2 = xx * xx + yy * yy
    r = np.sqrt(r2) / proj.rebydx
    lon = proj.stdlon + DEG_PER_RAD * np.arctan2(proj.hemi * xx, yy) / proj.cone
    lon = np.mod(lon + 360.0, 360.0)
    if chi1 == chi2:
        chi = 2.0 * np.arctan(
            np.power(r / np.tan(chi1), 1.0 / proj.cone) * np.tan(chi1 * 0.5)
        )
    else:
        chi = 2.0 * np.arctan(
            np.power(r * proj.cone / np.sin(chi1), 1.0 / proj.cone)
            * np.tan(chi1 * 0.5)
        )
    lat = (90.0 - chi * DEG_PER_RAD) * proj.hemi
    # pole point (r2 == 0)
    lat = np.where(r2 == 0.0, proj.hemi * 90.0, lat)
    lon = np.where(r2 == 0.0, proj.stdlon, lon)
    return lat, _wrap_lon(lon)


def _llij_lc(proj, lat, lon):
    """module_map_utils.F90:1236-1290 (llij_lc)."""
    deltalon = _wrap_lon(lon - proj.stdlon)
    ctl1r = np.cos(proj.truelat1 * RAD_PER_DEG)
    rm = (
        proj.rebydx
        * ctl1r
        / proj.cone
        * np.power(
            np.tan((90.0 * proj.hemi - lat) * RAD_PER_DEG / 2.0)
            / np.tan((90.0 * proj.hemi - proj.truelat1) * RAD_PER_DEG / 2.0),
            proj.cone,
        )
    )
    arg = proj.cone * (deltalon * RAD_PER_DEG)
    i = proj.polei + proj.hemi * rm * np.sin(arg)
    j = proj.polej - rm * np.cos(arg)
    return proj.hemi * i, proj.hemi * j


def _ijll_ps(proj, i, j):
    """module_map_utils.F90:763-822 (ijll_ps)."""
    reflon = proj.stdlon + 90.0
    scale_top = 1.0 + proj.hemi * np.sin(proj.truelat1 * RAD_PER_DEG)
    xx = i - proj.polei
    yy = (j - proj.polej) * proj.hemi
    r2 = xx ** 2 + yy ** 2
    gi2 = (proj.rebydx * scale_top) ** 2
    with np.errstate(invalid="ignore", divide="ignore"):
        lat = DEG_PER_RAD * proj.hemi * np.arcsin((gi2 - r2) / (gi2 + r2))
        arccos = np.arccos(np.clip(xx / np.sqrt(np.where(r2 == 0, 1.0, r2)), -1.0, 1.0))
    lon = np.where(yy > 0, reflon + DEG_PER_RAD * arccos, reflon - DEG_PER_RAD * arccos)
    lat = np.where(r2 == 0.0, proj.hemi * 90.0, lat)
    lon = np.where(r2 == 0.0, reflon, lon)
    return lat, _wrap_lon(lon)


def _llij_ps(proj, lat, lon):
    """module_map_utils.F90:718-760 (llij_ps)."""
    reflon = proj.stdlon + 90.0
    scale_top = 1.0 + proj.hemi * np.sin(proj.truelat1 * RAD_PER_DEG)
    ala = lat * RAD_PER_DEG
    rm = proj.rebydx * np.cos(ala) * scale_top / (1.0 + proj.hemi * np.sin(ala))
    alo = (lon - reflon) * RAD_PER_DEG
    return proj.polei + rm * np.cos(alo), proj.polej + proj.hemi * rm * np.sin(alo)


def _ijll_merc(proj, i, j):
    """module_map_utils.F90:1344-1362 (ijll_merc)."""
    lat = (
        2.0 * np.arctan(np.exp(proj.dlon_merc * (proj.rsw + j - proj.knownj)))
        * DEG_PER_RAD
        - 90.0
    )
    lon = (i - proj.knowni) * proj.dlon_merc * DEG_PER_RAD + proj.lon1
    return lat, _wrap_lon(lon)


def _llij_merc(proj, lat, lon):
    """module_map_utils.F90:1320-1341 (llij_merc)."""
    deltalon = _wrap_lon(lon - proj.lon1)
    i = proj.knowni + deltalon / (proj.dlon_merc * DEG_PER_RAD)
    j = (
        proj.knownj
        + np.log(np.tan(0.5 * ((lat + 90.0) * RAD_PER_DEG))) / proj.dlon_merc
        - proj.rsw
    )
    return i, j


def _ijll_latlon(proj, i, j):
    """module_map_utils.F90:1398-1428 (ijll_latlon) incl. periodic wrap."""
    span = proj.nxmax - proj.nxmin + 1
    i_work = np.where(i < proj.nxmin - 0.5, i + span, i)
    i_work = np.where(i_work >= proj.nxmax + 0.5, i_work - span, i_work)
    lat = proj.lat1 + (j - proj.knownj) * proj.latinc
    lon = proj.lon1 + (i_work - proj.knowni) * proj.loninc
    return lat, lon


def _llij_latlon(proj, lat, lon):
    """module_map_utils.F90:1365-1395 (llij_latlon)."""
    i = (lon - proj.lon1) / proj.loninc + proj.knowni
    j = (lat - proj.lat1) / proj.latinc + proj.knownj
    span = proj.nxmax - proj.nxmin + 1
    i = np.where(i < proj.nxmin - 0.5, i + span, i)
    i = np.where(i >= proj.nxmax + 0.5, i - span, i)
    return i, j


# ---------------------------------------------------------------------------
# Stagger-aware grid coordinate fields
# ---------------------------------------------------------------------------

_STAGGER_OFFSET = {M: (0.0, 0.0), U: (-0.5, 0.0), V: (0.0, -0.5), CORNER: (-0.5, -0.5)}


def stagger_latlon(proj: ProjInfo, ni: int, nj: int, stagger: int = M):
    """lat/lon arrays (nj, ni) for 1-based grid indices at the given stagger.

    Combines xytoll's stagger offsets (llxy_module.F90:182-203) with
    get_lat_lon_fields' index sweep (model_grid.F90:2188-2219); returns
    row-major (j, i)-indexed arrays.
    """
    di, dj = _STAGGER_OFFSET[stagger]
    ii = np.arange(1, ni + 1, dtype=np.float64)[None, :] + di
    jj = np.arange(1, nj + 1, dtype=np.float64)[:, None] + dj
    ii, jj = np.broadcast_arrays(ii, jj)
    return ij_to_latlon(proj, ii, jj)


def map_factor(proj: ProjInfo, lat):
    """Vectorized get_map_factor (model_grid.F90:2229-2365). Returns (mx, my)."""
    lat = np.asarray(lat, dtype=np.float64)
    if proj.code == PROJ_LC:
        if proj.truelat1 != proj.truelat2:
            colat1 = RAD_PER_DEG * (90.0 - proj.truelat1)
            colat2 = RAD_PER_DEG * (90.0 - proj.truelat2)
            n = (np.log(np.sin(colat1)) - np.log(np.sin(colat2))) / (
                np.log(np.tan(colat1 / 2.0)) - np.log(np.tan(colat2 / 2.0))
            )
            colat = RAD_PER_DEG * (90.0 - lat)
            mx = (
                np.sin(colat2)
                / np.sin(colat)
                * np.power(np.tan(colat / 2.0) / np.tan(colat2 / 2.0), n)
            )
        else:
            colat0 = RAD_PER_DEG * (90.0 - proj.truelat1)
            colat = RAD_PER_DEG * (90.0 - lat)
            mx = (
                np.sin(colat0)
                / np.sin(colat)
                * np.power(np.tan(colat / 2.0) / np.tan(colat0 / 2.0), np.cos(colat0))
            )
        return mx, mx
    if proj.code == PROJ_PS:
        mx = (1.0 + np.sin(RAD_PER_DEG * abs(proj.truelat1))) / (
            1.0 + np.sin(RAD_PER_DEG * np.sign(proj.truelat1 or 1.0) * lat)
        )
        return mx, mx
    if proj.code == PROJ_MERC:
        colat0 = RAD_PER_DEG * (90.0 - proj.truelat1)
        colat = RAD_PER_DEG * (90.0 - lat)
        mx = np.sin(colat0) / np.sin(colat)
        return mx, mx
    if proj.code == PROJ_LATLON:
        # The namelist path never calls get_map_factor for PROJ_LATLON in the
        # reference (it falls through every branch, leaving mapfac
        # *uninitialized*); we define mapfac=1 — a conscious deviation.
        one = np.ones_like(lat)
        return one, one
    raise ValueError(f"unsupported projection code {proj.code}")


def rotation_angle(lat, lon):
    """Vectorized get_rotang (model_grid.F90:2450-2507): (cosa, sina) from the
    local grid-northward direction. lat/lon are (nj, ni); differences taken
    along j (the reference's second index) with one-sided stencils at the
    j boundaries."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    d_lon = np.empty_like(lon)
    d_lat = np.empty_like(lat)
    d_lon[1:-1, :] = lon[2:, :] - lon[:-2, :]
    d_lat[1:-1, :] = lat[2:, :] - lat[:-2, :]
    d_lon[0, :] = lon[1, :] - lon[0, :]
    d_lat[0, :] = lat[1, :] - lat[0, :]
    d_lon[-1, :] = lon[-1, :] - lon[-2, :]
    d_lat[-1, :] = lat[-1, :] - lat[-2, :]
    d_lon = np.where(d_lon > 180.0, d_lon - 360.0, d_lon)
    d_lon = np.where(d_lon < -180.0, d_lon + 360.0, d_lon)
    alpha = np.arctan2(
        -np.cos(lat * RAD_PER_DEG) * (d_lon * RAD_PER_DEG), d_lat * RAD_PER_DEG
    )
    return np.cos(alpha), np.sin(alpha)
