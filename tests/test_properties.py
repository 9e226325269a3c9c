"""Property-based tests (hypothesis): roundtrip and algebraic laws the
reference pins with hand-picked cases (SURVEY §5) — generalized to
generated inputs. Strategies build structurally valid cells directly
(base cell + digit path, pentagon rules respected), so every law is
exercised across the whole index space, pentagons included.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

import h3ron_spark.h3core as h3c
from h3ron_spark.h3core import cells as C
from h3ron_spark.h3core import index as ix
from h3ron_spark.h3core import vectorized as V
from h3ron_spark.h3core.constants import PENTAGON_BASE_CELLS

_PENT = set(PENTAGON_BASE_CELLS)


@st.composite
def valid_cells(draw, max_res: int = 9):
    base = draw(st.integers(0, 121))
    res = draw(st.integers(0, max_res))
    h = ix.set_base_cell(ix.init_cell(res), base)
    lead = True
    for d in range(1, res + 1):
        if base in _PENT and lead:
            dig = draw(st.sampled_from([0, 2, 3, 4, 5, 6]))
        else:
            dig = draw(st.integers(0, 6))
        if dig != 0:
            lead = False
        h = ix.set_digit(h, d, dig)
    return h


@settings(max_examples=200, deadline=None)
@given(valid_cells())
def test_string_roundtrip(cell):
    assert int(f"{cell:x}", 16) == cell
    assert C.is_valid_cell(cell)


@settings(max_examples=200, deadline=None)
@given(valid_cells())
def test_parent_child_containment(cell):
    res = ix.get_resolution(cell)
    if res == 0:
        return
    parent = C.cell_to_parent(cell, res - 1)
    assert C.is_valid_cell(parent)
    assert cell in C.cell_to_children(parent, res)
    assert C.cell_to_parent(C.cell_to_center_child(cell, res + 1), res) == cell


@settings(max_examples=100, deadline=None)
@given(valid_cells(max_res=6))
def test_compact_uncompact_roundtrip(cell):
    """uncompact(x, r) then compact == [x] (CompactedCellVec law,
    frame/compact.rs:309-355 generalized)."""
    res = ix.get_resolution(cell)
    target = min(res + 2, 15)
    kids = C.uncompact_cells([cell], target)
    assert C.compact_cells(kids) == [cell]
    assert V.compact_cells_np(np.array(kids, dtype=np.int64)).tolist() == [cell]


@settings(max_examples=100, deadline=None)
@given(valid_cells(max_res=8), st.integers(0, 3))
def test_disk_contains_ring_and_origin(cell, k):
    disk = C.grid_disk(cell, k)
    assert cell in disk
    ring = C.grid_ring(cell, k)
    assert set(ring) <= set(disk)
    batch_c, batch_d, counts = V.grid_disk_distances_batch(
        np.array([cell], dtype=np.int64), k
    )
    assert counts[0] == len(disk)
    assert sorted(batch_c.tolist()) == sorted(disk)


@settings(max_examples=150, deadline=None)
@given(valid_cells(max_res=9))
def test_vectorized_validity_matches_scalar(cell):
    corrupt = cell | (7 << 39)
    arr = np.array([cell, corrupt, 0, -cell], dtype=np.int64)
    got = V.is_valid_cell_np(arr).tolist()
    exp = [C.is_valid_cell(int(x)) for x in arr]
    assert got == exp
