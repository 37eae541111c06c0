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


def _clamp_cell(grid: GridConfig, v: int) -> int:
    return max(0, min(grid.num_cells - 1, v // grid.cell_len))


@given(
    l_lo=st.integers(min_value=0, max_value=150),
    l_len=st.integers(min_value=0, max_value=40),
    r_lo=st.integers(min_value=0, max_value=150),
    r_len=st.integers(min_value=0, max_value=40),
    radius=st.integers(min_value=0, max_value=30),
)
@settings(max_examples=400, deadline=None)
def test_interval_join_replication_lemma(l_lo, l_len, r_lo, r_len, radius):
    """The lemma interval_interval_join relies on: if two intervals are
    within bbox distance `radius`, the left's radius-EXPANDED clamped cell
    range overlaps the right's plain clamped cell range — so the (ws, cell)
    equi-join finds every qualifying pair (completeness)."""
    l_hi, r_hi = l_lo + l_len, r_lo + r_len
    dist = max(0, l_lo - r_hi, r_lo - l_hi)
    if dist > radius:
        return
    lc_lo = _clamp_cell(GRID, l_lo - radius)
    lc_hi = _clamp_cell(GRID, l_hi + radius)
    rc_lo = _clamp_cell(GRID, r_lo)
    rc_hi = _clamp_cell(GRID, r_hi)
    assert lc_lo <= rc_hi and rc_lo <= lc_hi, (
        f"no shared cell for dist={dist} <= r={radius}: "
        f"l=[{l_lo},{l_hi}] r=[{r_lo},{r_hi}]"
    )


@given(
    tokens=st.lists(st.integers(min_value=0, max_value=140), min_size=1, max_size=12),
    q=st.integers(min_value=0, max_value=140),
    radius=st.integers(min_value=0, max_value=30),
)
@settings(max_examples=400, deadline=None)
def test_linestring_vertex_pruning_lemma(tokens, q, radius):
    """The lemma linestring_range/knn rely on: (a) the bbox distance
    lower-bounds the vertex distance (sound to prune on it), and (b) any
    vertex within `radius` of q lies in a bbox-covered cell that is also a
    candidate-or-guaranteed cell of q (complete)."""
    lo, hi = min(tokens), max(tokens)
    vdist = min(abs(t - q) for t in tokens)
    bdist = max(0, lo - q, q - hi)
    assert bdist <= vdist  # soundness of the bbox lower bound
    if vdist <= radius:
        v = min(tokens, key=lambda t: abs(t - q))
        vc = GRID.cell_of(v)
        covered = set(range(_clamp_cell(GRID, lo), _clamp_cell(GRID, hi) + 1))
        qcells = GRID.guaranteed_cells(q, radius) | GRID.candidate_cells(q, radius)
        assert vc in covered and vc in qcells
