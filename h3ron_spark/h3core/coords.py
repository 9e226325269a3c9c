"""Low-level coordinate math for the H3 grid: cube ijk coordinates,
planar hex2d coordinates, aperture-7 up/down scaling, rotations, and
spherical geodesy helpers. Scalar reference implementations (the
public H3 algorithm); hot paths are vectorized separately.
"""

from __future__ import annotations

import math

from h3ron_spark.h3core.constants import (
    EPSILON,
    FACE_AXES_AZ_0,
    FACE_CENTER_GEO,
    M_2PI,
    M_AP7_ROT_RADS,
    M_SIN60,
    M_SQRT3_2,
    M_SQRT7,
    RES0_U_GNOMONIC,
    UNIT_VECS,
)

# ------------------------------------------------------------------ ijk


def ijk_normalize(i: int, j: int, k: int) -> tuple[int, int, int]:
    if i < 0:
        j -= i
        k -= i
        i = 0
    if j < 0:
        i -= j
        k -= j
        j = 0
    if k < 0:
        i -= k
        j -= k
        k = 0
    m = min(i, j, k)
    return i - m, j - m, k - m


def ijk_add(a, b):
    return a[0] + b[0], a[1] + b[1], a[2] + b[2]


def ijk_sub(a, b):
    return ijk_normalize(a[0] - b[0], a[1] - b[1], a[2] - b[2])


def ijk_scale(a, f: int):
    return a[0] * f, a[1] * f, a[2] * f


_UNIT_VEC_DIGIT = {v: d for d, v in enumerate(UNIT_VECS)}


def ijk_to_digit(ijk) -> int:
    """Unit ijk vector -> direction digit, 7 (INVALID) if not a unit."""
    return _UNIT_VEC_DIGIT.get(ijk_normalize(*ijk), 7)


def ijk_rotate60_ccw(i: int, j: int, k: int) -> tuple[int, int, int]:
    # i -> (1,1,0), j -> (0,1,1), k -> (1,0,1)
    return ijk_normalize(i + k, i + j, j + k)


def ijk_rotate60_cw(i: int, j: int, k: int) -> tuple[int, int, int]:
    # i -> (1,0,1), j -> (1,1,0), k -> (0,1,1)
    return ijk_normalize(i + j, j + k, i + k)


def _lround(x: float) -> int:
    """C lround: round half away from zero."""
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def up_ap7(i: int, j: int, k: int) -> tuple[int, int, int]:
    """Find the center of the parent hex one aperture-7 (CCW) coarser."""
    ia = i - k
    ja = j - k
    return ijk_normalize(_lround((3 * ia - ja) / 7.0), _lround((ia + 2 * ja) / 7.0), 0)


def up_ap7r(i: int, j: int, k: int) -> tuple[int, int, int]:
    """Aperture-7 (CW) parent center."""
    ia = i - k
    ja = j - k
    return ijk_normalize(_lround((2 * ia + ja) / 7.0), _lround((3 * ja - ia) / 7.0), 0)


def down_ap7(i: int, j: int, k: int) -> tuple[int, int, int]:
    """Scale ijk to the aperture-7 (CCW) finer grid."""
    return ijk_normalize(3 * i + j, 3 * j + k, i + 3 * k)


def down_ap7r(i: int, j: int, k: int) -> tuple[int, int, int]:
    """Scale ijk to the aperture-7 (CW) finer grid."""
    return ijk_normalize(3 * i + k, i + 3 * j, j + 3 * k)


def down_ap3(i: int, j: int, k: int) -> tuple[int, int, int]:
    """Scale ijk to the aperture-3 (CCW) finer grid."""
    # i -> (2,0,1), j -> (1,2,0), k -> (0,1,2)
    return ijk_normalize(2 * i + j, 2 * j + k, i + 2 * k)


def down_ap3r(i: int, j: int, k: int) -> tuple[int, int, int]:
    """Scale ijk to the aperture-3 (CW) finer grid."""
    # i -> (2,1,0), j -> (0,2,1), k -> (1,0,2)
    return ijk_normalize(2 * i + k, i + 2 * j, j + 2 * k)


def neighbor_ijk(ijk, digit: int):
    if digit == 0:
        return ijk
    return ijk_normalize(*ijk_add(ijk, UNIT_VECS[digit]))


def rotate_digit_ccw(d: int) -> int:
    # CCW cycle: J->JK->K->IK->I->IJ->J  (i.e. 2->3->1->5->4->6->2)
    return {0: 0, 1: 5, 2: 3, 3: 1, 4: 6, 5: 4, 6: 2, 7: 7}[d]


def rotate_digit_cw(d: int) -> int:
    # exact inverse of rotate_digit_ccw
    return {0: 0, 1: 3, 2: 6, 3: 2, 4: 5, 5: 1, 6: 4, 7: 7}[d]


# ----------------------------------------------------------- hex2d <-> ijk


def ijk_to_hex2d(i: int, j: int, k: int) -> tuple[float, float]:
    ia = i - k
    ja = j - k
    return ia - 0.5 * ja, ja * M_SQRT3_2


def hex2d_to_ijk(x: float, y: float) -> tuple[int, int, int]:
    """Round planar hex coordinates to the containing cell's ijk
    (the public H3 hex-rounding case analysis)."""
    a1 = abs(x)
    a2 = abs(y)
    x2 = a2 / M_SIN60
    x1 = a1 + x2 / 2.0
    m1 = int(x1)
    m2 = int(x2)
    r1 = x1 - m1
    r2 = x2 - m2

    if r1 < 0.5:
        if r1 < 1.0 / 3.0:
            i = m1
            j = m2 if r2 < (1.0 + r1) / 2.0 else m2 + 1
        else:
            j = m2 if r2 < (1.0 - r1) else m2 + 1
            i = m1 + 1 if (1.0 - r1) <= r2 < (2.0 * r1) else m1
    else:
        if r1 < 2.0 / 3.0:
            j = m2 if r2 < (1.0 - r1) else m2 + 1
            i = m1 if (2.0 * r1 - 1.0) < r2 < (1.0 - r1) else m1 + 1
        else:
            i = m1 + 1
            j = m2 if r2 < (r1 / 2.0) else m2 + 1

    # fold across the axes if necessary
    if x < 0.0:
        if j % 2 == 0:
            axisi = j // 2
            diff = i - axisi
            i = i - 2 * diff
        else:
            axisi = (j + 1) // 2
            diff = i - axisi
            i = i - (2 * diff + 1)
    if y < 0.0:
        i = i - (2 * j + 1) // 2
        j = -j
    return ijk_normalize(i, j, 0)


# ------------------------------------------------------------- geodesy


def pos_angle(a: float) -> float:
    return a % M_2PI if a % M_2PI >= 0 else a % M_2PI + M_2PI


def geo_to_vec3(lat: float, lng: float) -> tuple[float, float, float]:
    cl = math.cos(lat)
    return cl * math.cos(lng), cl * math.sin(lng), math.sin(lat)


def geo_azimuth(lat1: float, lng1: float, lat2: float, lng2: float) -> float:
    """Azimuth (radians east of north) from p1 to p2 on the sphere."""
    return math.atan2(
        math.cos(lat2) * math.sin(lng2 - lng1),
        math.cos(lat1) * math.sin(lat2)
        - math.sin(lat1) * math.cos(lat2) * math.cos(lng2 - lng1),
    )


def geo_distance_rads(lat1, lng1, lat2, lng2) -> float:
    """Great-circle distance (haversine), radians."""
    sl = math.sin((lat2 - lat1) / 2.0)
    sg = math.sin((lng2 - lng1) / 2.0)
    a = sl * sl + math.cos(lat1) * math.cos(lat2) * sg * sg
    return 2.0 * math.asin(math.sqrt(min(1.0, a)))


def geo_az_distance(lat: float, lng: float, az: float, dist: float):
    """Destination point at azimuth/distance from (lat,lng), radians."""
    if dist < EPSILON:
        return lat, lng
    sin_lat = math.sin(lat) * math.cos(dist) + math.cos(lat) * math.sin(dist) * math.cos(az)
    sin_lat = max(-1.0, min(1.0, sin_lat))
    lat2 = math.asin(sin_lat)
    y = math.sin(az) * math.sin(dist) * math.cos(lat)
    x = math.cos(dist) - math.sin(lat) * sin_lat
    lng2 = lng + math.atan2(y, x)
    # normalize to [-pi, pi]
    while lng2 > math.pi:
        lng2 -= M_2PI
    while lng2 < -math.pi:
        lng2 += M_2PI
    return lat2, lng2


# ------------------------------------------------- face plane <-> geo


def geo_to_face(lat: float, lng: float) -> int:
    """Icosahedron face whose center is closest (max dot product)."""
    v = geo_to_vec3(lat, lng)
    best, bestdot = 0, -2.0
    for f in range(20):
        fc = _FACE_CENTER_VEC3[f]
        d = fc[0] * v[0] + fc[1] * v[1] + fc[2] * v[2]
        if d > bestdot:
            best, bestdot = f, d
    return best


_FACE_CENTER_VEC3 = tuple(geo_to_vec3(lat, lng) for lat, lng in FACE_CENTER_GEO)


def geo_to_hex2d(lat: float, lng: float, res: int) -> tuple[int, float, float]:
    """(lat,lng) -> (face, x, y) in the face's res-r Class grid."""
    face = geo_to_face(lat, lng)
    fc_lat, fc_lng = FACE_CENTER_GEO[face]
    v = geo_to_vec3(lat, lng)
    fc = _FACE_CENTER_VEC3[face]
    dot = max(-1.0, min(1.0, fc[0] * v[0] + fc[1] * v[1] + fc[2] * v[2]))
    r = math.acos(dot)
    if r < EPSILON:
        return face, 0.0, 0.0
    theta = pos_angle(FACE_AXES_AZ_0[face] - pos_angle(geo_azimuth(fc_lat, fc_lng, lat, lng)))
    if res % 2 == 1:  # Class III
        theta = pos_angle(theta - M_AP7_ROT_RADS)
    r = math.tan(r) / RES0_U_GNOMONIC
    for _ in range(res):
        r *= M_SQRT7
    return face, r * math.cos(theta), r * math.sin(theta)


def hex2d_to_geo(
    face: int, x: float, y: float, res: int, substrate: bool = False
) -> tuple[float, float]:
    """(face, x, y) at res-r -> (lat, lng). ``substrate`` interprets the
    coordinates on the aperture-3 substrate grid used for vertices."""
    r = math.hypot(x, y)
    fc_lat, fc_lng = FACE_CENTER_GEO[face]
    if r < EPSILON:
        return fc_lat, fc_lng
    theta = math.atan2(y, x)
    for _ in range(res):
        r /= M_SQRT7
    if substrate:
        r /= 3.0
        if res % 2 == 1:
            r /= M_SQRT7
    r *= RES0_U_GNOMONIC
    r = math.atan(r)
    if not substrate and res % 2 == 1:
        theta = pos_angle(theta + M_AP7_ROT_RADS)
    theta = pos_angle(FACE_AXES_AZ_0[face] - pos_angle(theta))
    return geo_az_distance(fc_lat, fc_lng, theta, r)
