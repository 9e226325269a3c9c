"""Constant tables of the public H3 spec (Uber H3, Apache-2.0).

Only the minimal hand-transcribed tables live here:
- ``FACE_CENTER_GEO``: lat/lng (radians) of the 20 icosahedron face
  centers (Dymaxion orientation).
- ``FACE_AXES_AZ_0``: azimuth (radians) from each face center to the
  Class II i-axis (only axis 0 is used by the coordinate math).
- ``BASE_CELL_DATA``: for each of the 122 base cells, its home face,
  home ijk coordinates on that face's resolution-0 grid, whether it is
  a pentagon, and (for pentagons) the two clockwise-offset faces.

The larger lookup tables libh3 ships as generated code (face/ijk →
base cell, face neighbor transforms) are derived numerically from
these in ``h3ron_spark.h3core.derive`` and validated by known-vector
tests.
"""

from __future__ import annotations

import math

# --- numeric constants ---
EPSILON = 1.0e-12
M_PI = math.pi
M_2PI = 2.0 * math.pi
M_PI_2 = math.pi / 2.0
M_SQRT3_2 = math.sqrt(3.0) / 2.0
M_SIN60 = M_SQRT3_2
M_SQRT7 = math.sqrt(7.0)
M_RSQRT7 = 1.0 / M_SQRT7
# rotation angle between Class II and Class III resolution axes
M_AP7_ROT_RADS = math.asin(math.sqrt(3.0 / 28.0))
# scaled unit distance of a res-0 hexagon in gnomonic space (1/phi^2)
RES0_U_GNOMONIC = 0.38196601125010500003
INV_RES0_U_GNOMONIC = 1.0 / RES0_U_GNOMONIC

EARTH_RADIUS_KM = 6371.007180918475

NUM_ICOSA_FACES = 20
NUM_BASE_CELLS = 122
MAX_H3_RES = 15

# --- H3 index bit layout ---
H3_INIT = 35184372088831  # every digit = 7, everything else 0
MODE_CELL = 1
MODE_EDGE = 2
RES_OFFSET = 52
BC_OFFSET = 45
MODE_OFFSET = 59
RESERVED_OFFSET = 56
DIGITS_MASK = (1 << 45) - 1

# direction digits
CENTER_DIGIT = 0
K_AXES_DIGIT = 1
J_AXES_DIGIT = 2
JK_AXES_DIGIT = 3
I_AXES_DIGIT = 4
IK_AXES_DIGIT = 5
IJ_AXES_DIGIT = 6
INVALID_DIGIT = 7

# icosahedron face centers in lat/lng radians (public H3 spec)
FACE_CENTER_GEO = (
    (0.803582649718989942, 1.248397419617396099),
    (1.307747883455638156, 2.536945009877921159),
    (1.054751253523952054, -1.347517358900396623),
    (0.600191595538186799, -0.450603909469755746),
    (0.491715428198773866, 0.401988202911306943),
    (0.172745327415618701, 1.678146885280433686),
    (0.605929321571350690, 2.953923329812411617),
    (0.427370518328979641, -1.888876200336285401),
    (-0.079066118549212831, -0.733429513380867741),
    (-0.230961644455383637, 0.506495587332349035),
    (0.079066118549212831, 2.408163140208925497),
    (0.230961644455383637, -2.635097066257444203),
    (-0.172745327415618701, -1.463445768309359553),
    (-0.605929321571350690, -0.187669323777381622),
    (-0.427370518328979641, 1.252716453253507838),
    (-0.600191595538186799, 2.690988744120037492),
    (-0.491715428198773866, -2.739604450678486295),
    (-0.803582649718989942, -1.893195233972397139),
    (-1.307747883455638156, -0.604647643711872080),
    (-1.054751253523952054, 1.794075294689396615),
)

# azimuth from face center to the Class II i-axis, radians
# (axis 0 of faceAxesAzRadsCII in the public spec; axes 1/2 are
# unused by the coordinate conversions)
FACE_AXES_AZ_0 = (
    5.619958268523939882,
    5.760339081714187279,
    0.780213654393430055,
    0.430469363979999913,
    6.130269123335111400,
    2.692877706530642877,
    2.982963003871839191,
    3.532912002790141181,
    3.494305004259568154,
    3.003214169499538391,
    5.930472956509811562,
    0.138378484090254847,
    0.448714947059150361,
    0.158629650112549365,
    5.891865957979238535,
    2.711123289609793325,
    3.294508837434268316,
    3.804819692245439833,
    3.664438879055192436,
    2.361378999196363184,
)

# base cell data: (home_face, (i, j, k), is_pentagon, (cw_off_a, cw_off_b))
# home ijk are resolution-0 coordinates on the home face; cw offsets
# are the two faces on which the pentagon's digit system is clockwise
# offset (-1 for non-pentagons and the two polar pentagons 4/117).
BASE_CELL_DATA = (
    (1, (1, 0, 0), False, (-1, -1)),   # 0
    (2, (1, 1, 0), False, (-1, -1)),   # 1
    (1, (0, 0, 0), False, (-1, -1)),   # 2
    (2, (1, 0, 0), False, (-1, -1)),   # 3
    (0, (2, 0, 0), True, (-1, -1)),    # 4 (pentagon)
    (1, (1, 1, 0), False, (-1, -1)),   # 5
    (1, (0, 0, 1), False, (-1, -1)),   # 6
    (2, (0, 0, 0), False, (-1, -1)),   # 7
    (0, (1, 0, 0), False, (-1, -1)),   # 8
    (2, (0, 1, 0), False, (-1, -1)),   # 9
    (1, (0, 1, 0), False, (-1, -1)),   # 10
    (1, (0, 1, 1), False, (-1, -1)),   # 11
    (3, (1, 0, 0), False, (-1, -1)),   # 12
    (3, (1, 1, 0), False, (-1, -1)),   # 13
    (11, (2, 0, 0), True, (2, 6)),     # 14 (pentagon)
    (4, (1, 0, 0), False, (-1, -1)),   # 15
    (0, (0, 0, 0), False, (-1, -1)),   # 16
    (6, (0, 1, 0), False, (-1, -1)),   # 17
    (0, (0, 0, 1), False, (-1, -1)),   # 18
    (2, (0, 1, 1), False, (-1, -1)),   # 19
    (7, (0, 0, 1), False, (-1, -1)),   # 20
    (2, (0, 0, 1), False, (-1, -1)),   # 21
    (0, (1, 1, 0), False, (-1, -1)),   # 22
    (6, (0, 0, 1), False, (-1, -1)),   # 23
    (10, (2, 0, 0), True, (1, 5)),     # 24 (pentagon)
    (6, (0, 0, 0), False, (-1, -1)),   # 25
    (3, (0, 0, 0), False, (-1, -1)),   # 26
    (11, (1, 0, 0), False, (-1, -1)),  # 27
    (4, (1, 1, 0), False, (-1, -1)),   # 28
    (3, (0, 1, 0), False, (-1, -1)),   # 29
    (0, (0, 1, 1), False, (-1, -1)),   # 30
    (4, (0, 0, 0), False, (-1, -1)),   # 31
    (5, (0, 1, 0), False, (-1, -1)),   # 32
    (0, (0, 1, 0), False, (-1, -1)),   # 33
    (7, (0, 1, 0), False, (-1, -1)),   # 34
    (11, (1, 1, 0), False, (-1, -1)),  # 35
    (7, (0, 0, 0), False, (-1, -1)),   # 36
    (10, (1, 0, 0), False, (-1, -1)),  # 37
    (12, (2, 0, 0), True, (3, 7)),     # 38 (pentagon)
    (6, (1, 0, 1), False, (-1, -1)),   # 39
    (7, (1, 0, 1), False, (-1, -1)),   # 40
    (4, (0, 0, 1), False, (-1, -1)),   # 41
    (3, (0, 0, 1), False, (-1, -1)),   # 42
    (3, (0, 1, 1), False, (-1, -1)),   # 43
    (4, (0, 1, 0), False, (-1, -1)),   # 44
    (6, (1, 0, 0), False, (-1, -1)),   # 45
    (11, (0, 0, 0), False, (-1, -1)),  # 46
    (8, (0, 0, 1), False, (-1, -1)),   # 47
    (5, (0, 0, 1), False, (-1, -1)),   # 48
    (14, (2, 0, 0), True, (0, 9)),     # 49 (pentagon)
    (5, (0, 0, 0), False, (-1, -1)),   # 50
    (12, (1, 0, 0), False, (-1, -1)),  # 51
    (10, (1, 1, 0), False, (-1, -1)),  # 52
    (4, (0, 1, 1), False, (-1, -1)),   # 53
    (12, (1, 1, 0), False, (-1, -1)),  # 54
    (7, (1, 0, 0), False, (-1, -1)),   # 55
    (11, (0, 1, 0), False, (-1, -1)),  # 56
    (10, (0, 0, 0), False, (-1, -1)),  # 57
    (13, (2, 0, 0), True, (4, 8)),     # 58 (pentagon)
    (10, (0, 0, 1), False, (-1, -1)),  # 59
    (11, (0, 0, 1), False, (-1, -1)),  # 60
    (9, (0, 1, 0), False, (-1, -1)),   # 61
    (8, (0, 1, 0), False, (-1, -1)),   # 62
    (6, (2, 0, 0), True, (11, 15)),    # 63 (pentagon)
    (8, (0, 0, 0), False, (-1, -1)),   # 64
    (9, (0, 0, 1), False, (-1, -1)),   # 65
    (14, (1, 0, 0), False, (-1, -1)),  # 66
    (5, (1, 0, 1), False, (-1, -1)),   # 67
    (16, (0, 1, 1), False, (-1, -1)),  # 68
    (8, (1, 0, 1), False, (-1, -1)),   # 69
    (5, (1, 0, 0), False, (-1, -1)),   # 70
    (12, (0, 0, 0), False, (-1, -1)),  # 71
    (7, (2, 0, 0), True, (12, 16)),    # 72 (pentagon)
    (12, (0, 1, 0), False, (-1, -1)),  # 73
    (10, (0, 1, 0), False, (-1, -1)),  # 74
    (9, (0, 0, 0), False, (-1, -1)),   # 75
    (13, (1, 0, 0), False, (-1, -1)),  # 76
    (16, (0, 0, 1), False, (-1, -1)),  # 77
    (15, (0, 1, 1), False, (-1, -1)),  # 78
    (15, (0, 1, 0), False, (-1, -1)),  # 79
    (16, (0, 1, 0), False, (-1, -1)),  # 80
    (14, (1, 1, 0), False, (-1, -1)),  # 81
    (13, (1, 1, 0), False, (-1, -1)),  # 82
    (5, (2, 0, 0), True, (10, 19)),    # 83 (pentagon)
    (8, (1, 0, 0), False, (-1, -1)),   # 84
    (14, (0, 0, 0), False, (-1, -1)),  # 85
    (9, (1, 0, 1), False, (-1, -1)),   # 86
    (14, (0, 0, 1), False, (-1, -1)),  # 87
    (17, (0, 0, 1), False, (-1, -1)),  # 88
    (12, (0, 0, 1), False, (-1, -1)),  # 89
    (16, (0, 0, 0), False, (-1, -1)),  # 90
    (17, (0, 1, 1), False, (-1, -1)),  # 91
    (15, (0, 0, 1), False, (-1, -1)),  # 92
    (16, (1, 0, 1), False, (-1, -1)),  # 93
    (9, (1, 0, 0), False, (-1, -1)),   # 94
    (15, (0, 0, 0), False, (-1, -1)),  # 95
    (13, (0, 0, 0), False, (-1, -1)),  # 96
    (8, (2, 0, 0), True, (13, 17)),    # 97 (pentagon)
    (13, (0, 1, 0), False, (-1, -1)),  # 98
    (17, (1, 0, 1), False, (-1, -1)),  # 99
    (19, (0, 1, 0), False, (-1, -1)),  # 100
    (14, (0, 1, 0), False, (-1, -1)),  # 101
    (19, (0, 1, 1), False, (-1, -1)),  # 102
    (17, (0, 1, 0), False, (-1, -1)),  # 103
    (13, (0, 0, 1), False, (-1, -1)),  # 104
    (17, (0, 0, 0), False, (-1, -1)),  # 105
    (16, (1, 0, 0), False, (-1, -1)),  # 106
    (9, (2, 0, 0), True, (14, 18)),    # 107 (pentagon)
    (15, (1, 0, 1), False, (-1, -1)),  # 108
    (15, (1, 0, 0), False, (-1, -1)),  # 109
    (18, (0, 1, 1), False, (-1, -1)),  # 110
    (18, (0, 0, 1), False, (-1, -1)),  # 111
    (19, (0, 0, 1), False, (-1, -1)),  # 112
    (17, (1, 0, 0), False, (-1, -1)),  # 113
    (19, (0, 0, 0), False, (-1, -1)),  # 114
    (18, (0, 1, 0), False, (-1, -1)),  # 115
    (18, (1, 0, 1), False, (-1, -1)),  # 116
    (19, (2, 0, 0), True, (-1, -1)),   # 117 (pentagon)
    (19, (1, 0, 0), False, (-1, -1)),  # 118
    (18, (0, 0, 0), False, (-1, -1)),  # 119
    (19, (1, 0, 1), False, (-1, -1)),  # 120
    (18, (1, 0, 0), False, (-1, -1)),  # 121
)

PENTAGON_BASE_CELLS = tuple(
    i for i, (_, _, pent, _) in enumerate(BASE_CELL_DATA) if pent
)

# unit ijk vectors per direction digit (CENTER, K, J, JK, I, IK, IJ)
UNIT_VECS = (
    (0, 0, 0),
    (0, 0, 1),
    (0, 1, 0),
    (0, 1, 1),
    (1, 0, 0),
    (1, 0, 1),
    (1, 1, 0),
)

# max coordinate dimension of the Class II res-r grid on a face
MAX_DIM_BY_CII_RES = tuple(
    (2 * 7 ** (r // 2)) if r % 2 == 0 else -1 for r in range(17)
)
UNIT_SCALE_BY_CII_RES = tuple(
    (7 ** (r // 2)) if r % 2 == 0 else -1 for r in range(17)
)
