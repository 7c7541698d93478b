"""Spatial QC oracle: buddy_check and sct.

Code-faithful float32 NumPy ports of reference src/qc_tests/buddy_check.rs:48-153
and src/qc_tests/sct.rs:189-470, including every quirk that is load-bearing
for output parity:

- **Radius unit quirk**: rstar's ``locate_within_distance`` takes a *squared*
  bound over km-scale chord xyz coordinates (spatial_tree.rs:60,
  util/mod.rs:94,101-107), so ``radii`` / ``outer_radius`` are effectively
  squared chord km² despite the docs saying meters. We match the code.
- **Self-exclusion by coordinates**, not index: buddy_check excludes
  neighbours whose xyz exactly equals the query's (spatial_tree.rs:63-66), so
  exactly co-located stations exclude each other.
- **Order-dependent sweeps**: flags mutate mid-sweep and are read by later
  stations (buddy_check.rs:84,98; sct.rs:321,336-337,455-459). Station order
  is ascending index.
- **step convergence bookkeeping quirk** (buddy_check.rs:140-149):
  ``num_removed_last_iteration`` is set to the per-iteration *delta*, not the
  running total.
- **sct obs_to_check member quirk** (sct.rs:444-448): when a box member is
  masked, the *center* is marked checked instead of the member.
- **sct flag-gate swap** (sct.rs:455-457): ``pos`` gates the negative-cvres
  branch and ``neg`` the non-negative one (opposite of the doc prose).

Deterministic deviation (documented, SURVEY §7.4): where the reference's f32
summation / neighbour iteration order follows unspecified R*-tree traversal,
this oracle uses ascending station index and numpy f32 reductions. All four
reference fixtures reproduce exactly (threshold-robust comparisons).
"""

from __future__ import annotations

import numpy as np

from olympian_spark.flags import Flag
from olympian_spark.oracle.quantile import compute_quantile

F32 = np.float32
RADIUS_EARTH = F32(6371.0)  # km, util/mod.rs:94


def convert_coordinates(lats: np.ndarray, lons: np.ndarray):
    """lat/lon degrees -> xyz chord coordinates on the 6371 km sphere,
    float32 throughout (util/mod.rs:101-107)."""
    lat = np.radians(np.asarray(lats, dtype=F32)).astype(F32)
    lon = np.radians(np.asarray(lons, dtype=F32)).astype(F32)
    x = (np.cos(lat) * np.cos(lon) * RADIUS_EARTH).astype(F32)
    y = (np.cos(lat) * np.sin(lon) * RADIUS_EARTH).astype(F32)
    z = (np.sin(lat) * RADIUS_EARTH).astype(F32)
    return x, y, z


def _chord2(x, y, z, i):
    """Squared chord distance from station i to all stations, f32,
    summation order x,y,z as in rstar's distance_2."""
    dx = (x - x[i]).astype(F32)
    dy = (y - y[i]).astype(F32)
    dz = (z - z[i]).astype(F32)
    return (dx * dx + dy * dy + dz * dz).astype(F32)


# Stations below this count use the plain O(n) chord scan per query — the
# vectorized scan over a few thousand f32 triples is cache-resident and
# beats the grid's bookkeeping. Above it, the uniform-grid index turns each
# sweep from O(n^2) into output-sensitive cost, the same role the
# reference's R*-tree plays (spatial_tree.rs:41, sct.rs:144-147).
_GRID_MIN_N = 4096


class _GridIndex:
    """Uniform-grid (cell-list / spatial-hash) neighbour index over chord
    xyz coordinates — the classic public technique for fixed-radius
    neighbour search (e.g. Hockney & Eastwood's cell lists).

    Cell edge = max search radius inflated by 0.1%: any two points within
    the radius then land in adjacent cells even after floating-point cell
    assignment (coords are binned in f64; the inflation dominates the
    1e-16 relative rounding), so a query scans exactly the 3^3 cells
    around the query point. Candidates are returned in ASCENDING station
    order with their exact-f32 squared chord distances — callers apply the
    same f32 filter as the brute-force path, making grid and brute force
    bit-identical by construction (f32 reductions downstream see the same
    elements in the same order).

    Degenerate geometries (cell-coordinate extent so large the packed key
    would overflow int64) disable the index; callers fall back to the
    brute scan. Build cost: one argsort of n packed keys.
    """

    __slots__ = ("x", "y", "z", "_kx", "_ky", "_kz", "_ny", "_nz",
                 "_order", "_keys", "ok")

    def __init__(self, x, y, z, radius: float):
        self.x, self.y, self.z = x, y, z
        cell = float(radius) * 1.001 + 1e-12
        kx = np.floor(x.astype(np.float64) / cell).astype(np.int64)
        ky = np.floor(y.astype(np.float64) / cell).astype(np.int64)
        kz = np.floor(z.astype(np.float64) / cell).astype(np.int64)
        kx -= kx.min()
        ky -= ky.min()
        kz -= kz.min()
        # +3 head-room so neighbour offsets (+/-1) of edge cells stay in
        # range of the packing without wrapping into another row
        nx, ny, nz = int(kx.max()) + 3, int(ky.max()) + 3, int(kz.max()) + 3
        if nx * ny * nz > (1 << 62):  # packed key would overflow
            self.ok = False
            return
        self.ok = True
        self._kx, self._ky, self._kz = kx, ky, kz
        self._ny, self._nz = ny, nz
        keys = (kx * ny + ky) * nz + kz
        self._order = np.argsort(keys, kind="stable")
        self._keys = keys[self._order]

    def neighborhood(self, i: int):
        """All stations in the 27 cells around station i, ascending station
        index, plus their f32 squared chord distances (exact `_chord2`
        arithmetic on the subset)."""
        ny, nz = self._ny, self._nz
        cx, cy, cz = int(self._kx[i]), int(self._ky[i]), int(self._kz[i])
        chunks = []
        for dx_ in (-1, 0, 1):
            for dy_ in (-1, 0, 1):
                row = ((cx + dx_) * ny + (cy + dy_)) * nz + cz
                lo = np.searchsorted(self._keys, row - 1, side="left")
                hi = np.searchsorted(self._keys, row + 1, side="right")
                if hi > lo:
                    chunks.append(self._order[lo:hi])
        cand = np.sort(np.concatenate(chunks)) if chunks else np.empty(0, np.int64)
        x, y, z = self.x, self.y, self.z
        ddx = (x[cand] - x[i]).astype(F32)
        ddy = (y[cand] - y[i]).astype(F32)
        ddz = (z[cand] - z[i]).astype(F32)
        c2 = (ddx * ddx + ddy * ddy + ddz * ddz).astype(F32)
        return cand, c2


def great_circle_matrix(lats: np.ndarray, lons: np.ndarray) -> np.ndarray:
    """Pairwise great-circle km distances, f32, clamped-acos form
    (util/mod.rs:110-136). Identical lat/lon pairs short-circuit to 0."""
    lat = np.radians(np.asarray(lats, dtype=F32)).astype(F32)
    lon = np.radians(np.asarray(lons, dtype=F32)).astype(F32)
    cx = (np.cos(lat) * np.cos(lon)).astype(F32)
    cy = (np.cos(lat) * np.sin(lon)).astype(F32)
    cz = np.sin(lat).astype(F32)
    ratio = (
        cx[:, None] * cx[None, :] + cy[:, None] * cy[None, :] + cz[:, None] * cz[None, :]
    ).astype(F32)
    # the reference clamps to [0,1] (also floors antipodal ratios at 0)
    ratio = np.clip(ratio, F32(0.0), F32(1.0))
    d = (np.arccos(ratio).astype(F32) * RADIUS_EARTH).astype(F32)
    same = (np.asarray(lats, F32)[:, None] == np.asarray(lats, F32)[None, :]) & (
        np.asarray(lons, F32)[:, None] == np.asarray(lons, F32)[None, :]
    )
    d[same] = F32(0.0)
    return d


def buddy_check(
    lats,
    lons,
    elevs,
    values,
    radii,
    nums_min,
    threshold: float,
    max_elev_diff: float,
    elev_gradient: float,
    min_std: float,
    num_iterations: int,
    obs_to_check=None,
) -> list[int]:
    """buddy_check.rs:48-153. Returns one flag code per station."""
    lats = np.asarray(lats, dtype=F32)
    lons = np.asarray(lons, dtype=F32)
    elevs = np.asarray(elevs, dtype=F32)
    values = np.asarray(values, dtype=F32)
    radii = np.asarray(radii, dtype=F32)
    nums_min = np.asarray(nums_min, dtype=np.int64)
    threshold = F32(threshold)
    max_elev_diff = F32(max_elev_diff)
    elev_gradient = F32(elev_gradient)
    min_std = F32(min_std)
    n = values.size

    x, y, z = convert_coordinates(lats, lons)

    # init: Fail where value non-finite (buddy_check.rs:61-71)
    flags = np.where(np.isfinite(values), int(Flag.PASS), int(Flag.FAIL)).astype(np.int64)

    # neighbour index for large slices (radii are SQUARED chord km² — the
    # reference's radius-unit quirk — so the grid cell is their sqrt)
    index = None
    if n >= _GRID_MIN_N:
        r2max = float(np.max(radii))
        if np.isfinite(r2max) and r2max > 0:
            idx = _GridIndex(x, y, z, np.sqrt(r2max))
            index = idx if idx.ok else None

    num_removed_last_iteration = 0
    for _it in range(num_iterations):
        for i in range(n):
            radius = radii[0] if radii.size == 1 else radii[i]
            num_min = int(nums_min[0] if nums_min.size == 1 else nums_min[i])

            if flags[i] != int(Flag.PASS):
                continue
            if obs_to_check is not None and not obs_to_check[i]:
                continue

            if index is not None:
                cand, c2c = index.neighborhood(i)
                neigh = cand[
                    (c2c <= radius)
                    & ~(
                        (x[cand] == x[i]) & (y[cand] == y[i]) & (z[cand] == z[i])
                    )
                ]
            else:
                c2 = _chord2(x, y, z, i)
                # squared-radius semantics + exclude exact xyz coincidence
                neigh = np.where(
                    (c2 <= radius) & ~((x == x[i]) & (y == y[i]) & (z == z[i]))
                )[0]

            list_buddies = np.empty(0, dtype=F32)
            if neigh.size >= num_min:
                keep = neigh[flags[neigh] == int(Flag.PASS)]
                if max_elev_diff > F32(0.0):
                    elev_diff = (elevs[i] - elevs[keep]).astype(F32)
                    ok = np.abs(elev_diff) <= max_elev_diff
                    list_buddies = (
                        values[keep][ok] + (elev_diff[ok] * elev_gradient).astype(F32)
                    ).astype(F32)
                else:
                    list_buddies = values[keep]

            nb = list_buddies.size
            if nb >= num_min:
                mean = F32(np.sum(list_buddies, dtype=F32) / F32(nb))
                variance = F32(
                    np.sum((list_buddies * list_buddies).astype(F32), dtype=F32) / F32(nb)
                    - mean * mean
                )
                with np.errstate(invalid="ignore"):
                    s = np.sqrt(F32(variance + variance / F32(nb)))
                # max_by with partial_cmp.unwrap_or(Equal): NaN -> min_std
                std_adjusted = min_std if np.isnan(s) else max(F32(s), min_std)
                if F32(np.abs(F32(values[i] - mean))) / std_adjusted > threshold:
                    flags[i] = int(Flag.FAIL)

        num_removed = int(np.sum(flags != int(Flag.PASS)))
        num_removed_current = num_removed - num_removed_last_iteration
        if num_removed_current == 0:
            break
        # quirk: stores the delta, not the total (buddy_check.rs:149)
        num_removed_last_iteration = num_removed_current

    return [int(f) for f in flags]


def _theil_sen_profile(
    elevs: np.ndarray, values: np.ndarray, num_min_prof: int, min_elev_diff: float
) -> np.ndarray:
    """Vertical-profile background, sct.rs:15-67."""
    n = values.size
    gamma = F32(-0.0065)
    mean_t = F32(np.sum(values, dtype=F32) / F32(n))
    if np.min(elevs) == np.max(elevs):
        return np.full(n, mean_t, dtype=F32)
    z05 = compute_quantile(0.05, elevs)
    z95 = compute_quantile(0.95, elevs)
    use_basic = n < num_min_prof or (z95 - z05) < F32(min_elev_diff)
    if use_basic:
        m_median = gamma
    else:
        de = (elevs[:, None] - elevs[None, :]).astype(F32)
        dv = (values[:, None] - values[None, :]).astype(F32)
        iu, ju = np.triu_indices(n, k=1)
        de_u = de[iu, ju]
        dv_u = dv[iu, ju]
        with np.errstate(divide="ignore", invalid="ignore"):
            slopes = np.where(np.abs(de_u) < F32(1.0), F32(0.0), (dv_u / de_u).astype(F32))
        m_median = compute_quantile(0.5, slopes)
    q = (values - (m_median * elevs).astype(F32)).astype(F32)
    q_median = compute_quantile(0.5, q)
    return (q_median + (m_median * elevs).astype(F32)).astype(F32)


def sct(
    lats,
    lons,
    elevs,
    values,
    num_min: int,
    num_max: int,
    inner_radius: float,
    outer_radius: float,
    num_iterations: int,
    num_min_prof: int,
    min_elev_diff: float,
    min_horizontal_scale: float,
    vertical_scale: float,
    pos,
    neg,
    eps2,
    obs_to_check=None,
) -> list[int]:
    """Spatial consistency test, sct.rs:189-470. Returns flag codes."""
    lats = np.asarray(lats, dtype=F32)
    lons = np.asarray(lons, dtype=F32)
    elevs = np.asarray(elevs, dtype=F32)
    values = np.asarray(values, dtype=F32)
    pos = np.asarray(pos, dtype=F32)
    neg = np.asarray(neg, dtype=F32)
    eps2 = np.asarray(eps2, dtype=F32)
    n = values.size

    # validation (sct.rs:207-293) — driver-side ValueError, never in executors
    for name, arr in (("pos", pos), ("neg", neg), ("eps2", eps2)):
        if arr.size != n:
            raise ValueError(f"InvalidInputShape: {name}")
    if obs_to_check is not None and len(obs_to_check) != n:
        raise ValueError("InvalidInputShape: obs_to_check")
    if num_min < 2:
        raise ValueError("num_min must be > 1")
    if num_max < num_min:
        raise ValueError("num_max must be >= num_min")
    if num_iterations < 1:
        raise ValueError("num_iterations must be >= 1")
    if min_elev_diff <= 0 or min_horizontal_scale <= 0 or vertical_scale <= 0:
        raise ValueError("scales must be > 0")
    if inner_radius < 0 or outer_radius < inner_radius:
        raise ValueError("invalid radii")
    if np.any(eps2 <= 0) or np.any(pos < 0) or np.any(neg < 0):
        raise ValueError("invalid pos/neg/eps2")

    inner_radius = F32(inner_radius)
    outer_radius = F32(outer_radius)
    min_elev_diff = F32(min_elev_diff)
    min_horizontal_scale = F32(min_horizontal_scale)
    vertical_scale = F32(vertical_scale)

    x, y, z = convert_coordinates(lats, lons)

    flags = np.full(n, int(Flag.PASS), dtype=np.int64)
    prob_gross_error = np.zeros(n, dtype=F32)  # computed, never returned (sct.rs:296)
    flags[~np.isfinite(elevs)] = int(Flag.INVALID)  # sct.rs:298-302

    # neighbour index for large slices (outer_radius is squared chord km² —
    # the reference's radius-unit quirk)
    index = None
    if n >= _GRID_MIN_N and float(outer_radius) > 0:
        idx = _GridIndex(x, y, z, float(np.sqrt(np.float64(outer_radius))))
        index = idx if idx.ok else None

    for _it in range(num_iterations):
        num_thrown_out = 0
        checked = np.zeros(n, dtype=bool)

        for i in range(n):
            if obs_to_check is not None and not obs_to_check[i]:
                checked[i] = True
                continue
            if flags[i] != int(Flag.PASS):
                checked[i] = True
                continue
            if checked[i]:
                continue

            # outer-radius box, self INCLUDED (include_match=true), squared
            # bound; distances are un-squared chord km (spatial_tree.rs:70-91)
            if index is not None:
                cand0, c2c = index.neighborhood(i)
                within = c2c <= outer_radius
                cand = cand0[within]
                c2w = c2c[within]
                keep = flags[cand] == int(Flag.PASS)  # remove_flagged
                cand = cand[keep]
                dist = np.sqrt(c2w[keep]).astype(F32)
            else:
                c2 = _chord2(x, y, z, i)
                cand = np.where(c2 <= outer_radius)[0]
                cand = cand[flags[cand] == int(Flag.PASS)]  # remove_flagged
                dist = np.sqrt(c2[cand]).astype(F32)

            if cand.size > num_max:
                # stable sort by distance asc (ties keep index order), take num_max
                order = np.argsort(dist, kind="stable")[:num_max]
                cand = cand[order]
                dist = dist[order]
            if cand.size < num_min:
                checked[i] = True
                flags[i] = int(Flag.ISOLATED)
                continue

            box = cand
            bs = box.size
            lats_box = lats[box]
            lons_box = lons[box]
            elevs_box = elevs[box]
            values_box = values[box]
            eps2_box = eps2[box]

            vp = _theil_sen_profile(elevs_box, values_box, num_min_prof, min_elev_diff)

            disth = great_circle_matrix(lats_box, lons_box)
            distz = np.abs(elevs_box[:, None] - elevs_box[None, :]).astype(F32)

            # dh[i] = 0.10-quantile of off-diagonal row (sct.rs:380-390)
            dh = np.empty(bs, dtype=F32)
            offdiag = ~np.eye(bs, dtype=bool)
            for r in range(bs):
                dh[r] = compute_quantile(0.10, disth[r][offdiag[r]])
            dh_mean = max(min_horizontal_scale, F32(np.sum(dh, dtype=F32) / F32(bs)))

            s_mat = np.exp(
                (
                    F32(-0.5) * ((disth / dh_mean).astype(F32) ** 2)
                    - F32(0.5) * ((distz / vertical_scale).astype(F32) ** 2)
                ).astype(F32)
            ).astype(F32)
            s_weighted = s_mat.copy()
            s_weighted[np.arange(bs), np.arange(bs)] += eps2_box

            d = (values_box - vp).astype(F32)

            s_inv = np.linalg.inv(s_weighted).astype(F32)  # f32 partial-pivot LU
            # (the reference then unweights the diagonal of s in place;
            #  s_mat above is already the unweighted matrix)
            s_inv_d = (s_inv @ d).astype(F32)
            ares_temp = (s_mat @ s_inv_d).astype(F32)
            z_inv = (F32(1.0) / np.diag(s_inv)).astype(F32)
            ares = (ares_temp - d).astype(F32)
            cvres = (-z_inv * s_inv_d).astype(F32)
            sig2o = max(F32(0.01), F32(np.sum((d * -ares).astype(F32), dtype=F32) / F32(bs)))

            curr = i
            for k in range(bs):
                idx = int(box[k])
                if obs_to_check is not None and not obs_to_check[idx]:
                    checked[curr] = True  # quirk: marks the CENTER (sct.rs:444-448)
                    continue
                if dist[k] <= inner_radius:
                    pog = F32(cvres[k] * ares[k] / sig2o)
                    if not np.isfinite(pog):
                        raise AssertionError("non-finite prob_gross_error")
                    prob_gross_error[idx] = max(pog, prob_gross_error[idx])
                    # pos gates the NEGATIVE-cvres branch (sct.rs:455-457)
                    if (cvres[k] < F32(0.0) and pog > pos[idx]) or (
                        cvres[k] >= F32(0.0) and pog > neg[idx]
                    ):
                        flags[idx] = int(Flag.FAIL)
                        num_thrown_out += 1
                    checked[idx] = True

        if num_thrown_out == 0:
            break

    return [int(f) for f in flags]
