"""Engine configuration — the analog of the reference's config surface.

Reference: utils/Params.java:11-80 + conf/geoflink-conf.yml (grid bbox, cell
count, query option, radius, k, window type/size/slide, allowedLateness) and
spatialOperators/QueryConfiguration.java (RealTime / WindowBased /
RealTimeNaive + approximateQuery flag).
"""

from __future__ import annotations

from dataclasses import dataclass, field


VOCAB_SIZE = 50257  # GPT-2-ish vocab; token ids live in [0, VOCAB_SIZE)
HASH_MOD = 1_000_000_007  # prime modulus for portable array checksums
EPOCH0 = 1_767_225_600  # 2026-01-01T00:00:00Z — base of the synthetic event-time axis
TS_SPREAD_S = 600  # synthetic sequences span 600s of event time


@dataclass(frozen=True)
class GridConfig:
    """1-D uniform grid over the n_tok axis.

    The token-domain analog of the reference's square uniform grid
    (spatialIndices/UniformGrid.java:74-85): the domain [0, num_cells*cell_len)
    is split into equal cells; each row's cell is floor(n_tok / cell_len),
    clamped into range (reference clamps via bbox, HelperClass.java:104-116).
    The cell id is the *logical* partition key used for pruning and shuffling,
    exactly as gridID is in the reference.
    """

    cell_len: int = 8
    num_cells: int = 16

    @property
    def max_n_tok(self) -> int:
        return self.cell_len * self.num_cells

    def cell_of(self, n_tok: int) -> int:
        c = n_tok // self.cell_len
        return max(0, min(self.num_cells - 1, c))

    def cell_bounds(self, cell: int) -> tuple[int, int]:
        """Inclusive integer n_tok bounds covered by `cell` (clamped grid)."""
        lo = cell * self.cell_len
        hi = (cell + 1) * self.cell_len - 1
        if cell == self.num_cells - 1:
            hi = 2**31 - 1  # top cell absorbs the clamp
        if cell == 0:
            lo = 0
        return lo, hi

    def guaranteed_cells(self, q: int, r: int) -> set[int]:
        """Cells entirely inside [q-r, q+r]: rows there are emitted WITHOUT a
        distance check — the 1-D analog of
        UniformGrid.getGuaranteedNeighboringCells (UniformGrid.java:165-190)."""
        out = set()
        for c in range(self.num_cells):
            lo, hi = self.cell_bounds(c)
            if lo >= q - r and hi <= q + r:
                out.add(c)
        return out

    def candidate_cells(self, q: int, r: int) -> set[int]:
        """Cells that *intersect* [q-r, q+r] but are not guaranteed: rows there
        need the exact |n_tok - q| <= r check — analog of
        UniformGrid.getCandidateNeighboringCells (UniformGrid.java:368-395).
        r == 0 semantics follow UniformGrid.getNeighboringCells
        (UniformGrid.java:264-266): r=0 means ALL cells are candidates."""
        if r == 0:
            return set(range(self.num_cells))
        g = self.guaranteed_cells(q, r)
        out = set()
        for c in range(self.num_cells):
            lo, hi = self.cell_bounds(c)
            if hi >= q - r and lo <= q + r and c not in g:
                out.add(c)
        return out


@dataclass(frozen=True)
class QueryPoint:
    """Static query point on the n_tok axis — analog of the config-driven
    query point set (conf/geoflink-conf.yml:63-74, StreamingJob.java:213-232)."""

    q_id: str
    q_n_tok: int
    radius: int
    k: int


# The default static query set used by tests, the driver gate and bench.
DEFAULT_QUERY_POINTS: tuple[QueryPoint, ...] = (
    QueryPoint("q_small", 24, 6, 5),
    QueryPoint("q_mid", 48, 12, 10),
    QueryPoint("q_wide", 64, 40, 25),
)


@dataclass(frozen=True)
class EngineConfig:
    """Window + watermark + skew knobs.

    Window defaults mirror the benchmarked reference windows
    (MN_Q1 5s tumbling, MN_Q2 10s/200ms sliding — sncb/mobility/MN_Q1.java:73,
    MN_Q2.java:85) scaled to the 600s synthetic event-time axis.
    allowed_lateness mirrors BoundedOutOfOrdernessTimestampExtractor seconds
    (MN_Q1.java:47 = 2s).
    """

    grid: GridConfig = field(default_factory=GridConfig)
    tumbling_s: int = 60
    sliding_size_s: int = 60
    sliding_slide_s: int = 20
    session_gap_s: int = 30
    allowed_lateness_s: int = 2
    join_radius: int = 4
    # physical knobs
    shuffle_partitions: int = 32
    salt_buckets: int = 8  # salt fan-out for skewed (source) groups


DEFAULT_CONFIG = EngineConfig()
