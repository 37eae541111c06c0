"""Pure-python unit tests of the grid cell math — SURVEY.md §5.2 item 3:
guaranteed/candidate cell sets vs brute force over the integer n_tok domain
(semantics of UniformGrid.java:165-190 / :368-395 / :264-266 in 1-D).
No SparkSession needed."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from spatialflink_spark.config import GridConfig

GRID = GridConfig(cell_len=8, num_cells=16)


def brute_force_cells(grid: GridConfig, q: int, r: int):
    """For every representable n_tok value, which cells hold in-range /
    out-of-range rows?"""
    in_range_cells, any_cells = set(), set()
    for n_tok in range(0, grid.cell_len * grid.num_cells + 200):
        c = grid.cell_of(n_tok)
        any_cells.add(c)
        if abs(n_tok - q) <= r:
            in_range_cells.add(c)
    return in_range_cells, any_cells


@given(
    q=st.integers(min_value=0, max_value=140),
    r=st.integers(min_value=0, max_value=140),
)
@settings(max_examples=300, deadline=None)
def test_guaranteed_and_candidate_cover_exactly(q, r):
    g = GRID.guaranteed_cells(q, r)
    c = GRID.candidate_cells(q, r)
    in_range, _ = brute_force_cells(GRID, q, r)

    # soundness of guaranteed: EVERY row in a guaranteed cell is in range
    for cell in g:
        lo, hi = GRID.cell_bounds(cell)
        hi_checkable = min(hi, GRID.max_n_tok + 200)
        for n_tok in range(lo, hi_checkable + 1):
            assert abs(n_tok - q) <= r, (cell, n_tok, q, r)

    # completeness: every cell containing an in-range row is guaranteed or
    # candidate (no pruning loss)
    assert in_range <= (g | c), (q, r, in_range, g, c)

    # disjointness
    assert not (g & c)


def test_r_zero_means_all_candidates():
    """r=0 -> all cells candidate (UniformGrid.java:264-266 semantics)."""
    assert GRID.candidate_cells(40, 0) == set(range(GRID.num_cells))
    assert GRID.guaranteed_cells(40, 0) == set()


def test_clamping_edges():
    # top cell absorbs everything above the grid
    assert GRID.cell_of(10_000) == GRID.num_cells - 1
    assert GRID.cell_of(0) == 0
    lo, hi = GRID.cell_bounds(GRID.num_cells - 1)
    assert hi > GRID.max_n_tok  # open-ended top cell
