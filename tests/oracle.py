"""Independent scalar weight oracles (VERDICT round-1 item 5).

Dead-simple per-target Python loops, deliberately sharing NO code with
``mpassit_tpu/weights/``:

- bilinear-on-dual: ray/plane intersection + 2-D sub-triangle areas
  (production uses normalized spherical triple products);
- nearest: scalar argmin of great-circle distance (production uses a
  cKDTree over chord distance);
- conservative: textbook Sutherland–Hodgman with Python lists in the
  gnomonic tangent plane (production uses a vectorized padded-array clip
  or the C kernel).

These implement the same documented semantics (DESIGN.md "Method
semantics") through different math, so agreement to ~1e-12 validates the
production *weights*, not just the apply.
"""

import math

import numpy as np


def _xyz(lat_deg, lon_deg):
    la, lo = math.radians(lat_deg), math.radians(lon_deg)
    return np.array([math.cos(la) * math.cos(lo),
                     math.cos(la) * math.sin(lo),
                     math.sin(la)])


def oracle_bilinear_cell(mesh, lat_t, lon_t):
    """Per-target dict {cell_id: weight} via plane-intersection barycentric
    over ALL complete dual triangles (exhaustive containment search)."""
    tris = mesh.complete_triangles()
    out = []
    for lat, lon in zip(np.ravel(lat_t), np.ravel(lon_t)):
        p = _xyz(lat, lon)
        best = None          # (min_bary, {cell: w})
        for (ca, cb, cc) in tris:
            A = _xyz(mesh.lat_cell[ca], mesh.lon_cell[ca])
            B = _xyz(mesh.lat_cell[cb], mesh.lon_cell[cb])
            C = _xyz(mesh.lat_cell[cc], mesh.lon_cell[cc])
            # intersect the ray origin->p with the plane through A, B, C
            nrm = np.cross(B - A, C - A)
            denom = float(np.dot(nrm, p))
            if abs(denom) < 1e-300:
                continue
            t = float(np.dot(nrm, A)) / denom
            if t <= 0:
                continue         # triangle is on the antipodal hemisphere
            q = t * p            # point in the triangle's plane
            # 2-D barycentric via sub-areas (projected on the plane normal)
            area = float(np.dot(nrm, np.cross(B - A, C - A)))
            wa = float(np.dot(nrm, np.cross(B - q, C - q))) / area
            wb = float(np.dot(nrm, np.cross(C - q, A - q))) / area
            wc = float(np.dot(nrm, np.cross(A - q, B - q))) / area
            mn = min(wa, wb, wc)
            if best is None or mn > best[0]:
                best = (mn, {int(ca): wa, int(cb): wb, int(cc): wc})
        if best is None or best[0] < -1e-9:
            out.append({})       # unmapped (quirk Q5)
        else:
            w = {c: max(v, 0.0) for c, v in best[1].items()}
            s = sum(w.values())
            out.append({c: v / s for c, v in w.items()})
    return out


def oracle_nearest(mesh, lat_t, lon_t):
    """Per-target {cell: 1.0} by scalar great-circle argmin."""
    out = []
    for lat, lon in zip(np.ravel(lat_t), np.ravel(lon_t)):
        p = _xyz(lat, lon)
        dists = [math.acos(np.clip(np.dot(p, _xyz(la, lo)), -1, 1))
                 for la, lo in zip(mesh.lat_cell, mesh.lon_cell)]
        out.append({int(np.argmin(dists)): 1.0})
    return out


def _clip_poly(subject, a, b):
    """Sutherland–Hodgman single-edge clip: keep the side left of a->b."""
    def side(p):
        return (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])

    out = []
    n = len(subject)
    for i in range(n):
        cur, nxt = subject[i], subject[(i + 1) % n]
        dc, dn = side(cur), side(nxt)
        if dc >= 0:
            out.append(cur)
            if dn < 0:
                t = dc / (dc - dn)
                out.append((cur[0] + t * (nxt[0] - cur[0]),
                            cur[1] + t * (nxt[1] - cur[1])))
        elif dn >= 0:
            t = dc / (dc - dn)
            out.append((cur[0] + t * (nxt[0] - cur[0]),
                        cur[1] + t * (nxt[1] - cur[1])))
    return out


def _area(poly):
    s = 0.0
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        s += x1 * y2 - x2 * y1
    return 0.5 * s


def oracle_conservative(mesh, grid):
    """Per-target {cell: overlap_fraction} by scalar clipping of every
    source Voronoi polygon against the target quad in the gnomonic plane
    tangent at the target center (same geometry contract as production)."""
    lat4, lon4 = grid.corner_quads()
    T = grid.lat.size
    out = []
    for t in range(T):
        j, i = divmod(t, grid.nx)
        nvec = _xyz(grid.lat[j, i], grid.lon[j, i])
        ref = np.array([0.0, 0.0, 1.0]) if abs(nvec[2]) < 0.9 else \
            np.array([1.0, 0.0, 0.0])
        e1 = np.cross(ref, nvec)
        e1 /= np.linalg.norm(e1)
        e2 = np.cross(nvec, e1)

        def gno(v):
            d = float(np.dot(v, nvec))
            return (float(np.dot(v, e1)) / d, float(np.dot(v, e2)) / d)

        quad = [gno(_xyz(lat4[j, i, k], lon4[j, i, k])) for k in range(4)]
        if _area(quad) < 0:
            quad = quad[::-1]
        qarea = _area(quad)
        row = {}
        for s in range(mesh.ncells):
            verts = [v for v in mesh.vertices_on_cell[s] if v >= 0]
            vxyz = [_xyz(mesh.lat_vertex[v], mesh.lon_vertex[v])
                    for v in verts]
            # gnomonic projection is 2-to-1: far-hemisphere cells (dn <= 0
            # for any vertex) would project as phantom covers on a GLOBAL
            # mesh. A cell genuinely overlapping the (small) target quad
            # has every vertex well inside the near hemisphere.
            if any(float(np.dot(v, nvec)) <= 0.1 for v in vxyz):
                continue
            poly = [gno(v) for v in vxyz]
            if _area(poly) < 0:
                poly = poly[::-1]
            for k in range(4):
                poly = _clip_poly(poly, quad[k], quad[(k + 1) % 4])
                if len(poly) < 3:
                    poly = []
                    break
            frac = _area(poly) / qarea if poly else 0.0
            if frac > 1e-12:
                row[s] = frac
        out.append(row)
    return out


def ell_to_dicts(ell):
    """Production ELLWeights -> per-target {src: weight} for comparison."""
    T = ell.idx.shape[0] if ell.idx.ndim == 2 else len(ell.idx)
    idx = ell.idx.reshape(T, -1)
    w = ell.w.reshape(T, -1)
    out = []
    for t in range(T):
        row = {}
        for c, v in zip(idx[t], w[t]):
            if v != 0.0:
                row[int(c)] = row.get(int(c), 0.0) + float(v)
        out.append(row)
    return out


def assert_weight_dicts_close(got, want, tol=1e-12):
    """Compare per-target weight dicts over the union of keys (a weight may
    be exactly 0 in one implementation and FP-noise ~1e-17 in the other)."""
    assert len(got) == len(want)
    for t, (g, ww) in enumerate(zip(got, want)):
        for c in set(g) | set(ww):
            assert abs(g.get(c, 0.0) - ww.get(c, 0.0)) <= tol, \
                (t, c, g.get(c, 0.0), ww.get(c, 0.0))
