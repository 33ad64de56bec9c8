"""Property-based tests (hypothesis) for the pure arithmetic under the
pair-block tiling and document chunking — no SparkSession needed, so
these run in milliseconds and explore the space far beyond the fixture
shapes.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def _tiles_for_chunk(c: int, nc: int) -> set[tuple[int, int]]:
    """Mirror of pair_blocks.tile_pair_blocks: the tiles a row with
    chunk id ``c`` replicates into."""
    return {(min(o, c), max(o, c)) for o in range(nc)}


def _owned(ci: int, cj: int, ca: int, cb: int) -> bool:
    """Mirror of pair_blocks.owned_pair_mask for one pair."""
    return (ci == ca and cj == cb) or (ci == cb and cj == ca)


@settings(max_examples=300, deadline=None)
@given(
    n=st.integers(1, 60),
    max_rows=st.integers(1, 12),
    hashes=st.lists(st.integers(0, 2**63 - 1), min_size=60, max_size=60),
)
def test_every_pair_owned_by_exactly_one_tile(n, max_rows, hashes):
    """For ANY block size / chunk bound / hash assignment: every
    unordered row pair (including self-pairs) is owned by EXACTLY one
    tile among the tiles both rows replicate into — the invariant that
    makes the tiled kernel union equal the unchunked kernel."""
    nc = -(n // -max_rows)  # ceil, as in tile_pair_blocks
    chunk = [hashes[i] % nc for i in range(n)]
    for i in range(n):
        for j in range(i, n):
            shared = _tiles_for_chunk(chunk[i], nc) & _tiles_for_chunk(chunk[j], nc)
            owners = [t for t in shared if _owned(chunk[i], chunk[j], *t)]
            assert len(owners) == 1, (i, j, chunk[i], chunk[j], shared)


@settings(max_examples=300, deadline=None)
@given(n=st.integers(0, 500))
def test_chunk_count_and_coverage(n):
    """udtf_chunk_docs arithmetic: the nchunks formula covers every
    token exactly with CHUNK_SIZE windows at CHUNK_STRIDE, the last
    chunk is non-empty, and no chunk start lands beyond the tokens."""
    from data_integration_tool_spark.operators.udfs import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
    )

    if n <= CHUNK_SIZE:
        nchunks = 1
    else:
        nchunks = -((n - CHUNK_SIZE) // -CHUNK_STRIDE) + 1
    covered = set()
    for k in range(nchunks):
        lo = k * CHUNK_STRIDE
        hi = min(lo + CHUNK_SIZE, n)
        assert lo < max(n, 1), (n, k)  # no chunk starts past the end
        assert hi - lo >= 1 or n == 0
        covered.update(range(lo, hi))
    assert covered == set(range(n))  # every token in some chunk
    # minimality: the last chunk contributes tokens the earlier chunks
    # did not reach (i.e. nchunks-1 chunks would NOT cover everything)
    if nchunks >= 2:
        prev_hi = min((nchunks - 2) * CHUNK_STRIDE + CHUNK_SIZE, n)
        assert prev_hi < n


@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=40),
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=40),
)
@settings(max_examples=200, deadline=None)
def test_ks_cross_multiplied_gap_equals_float_form(xs, ys):
    """The dq_ks_test integer identity: max |cum_a·n_b − cum_b·n_a|
    / (n_a·n_b) must equal the textbook max |F_a(v) − F_b(v)| over the
    pooled support, for arbitrary integer samples."""
    import collections

    ca = collections.Counter(xs)
    cb = collections.Counter(ys)
    support = sorted(set(xs) | set(ys))
    na, nb = len(xs), len(ys)
    cum_a = cum_b = 0
    max_scaled = 0
    max_float = 0.0
    for v in support:
        cum_a += ca.get(v, 0)
        cum_b += cb.get(v, 0)
        max_scaled = max(max_scaled, abs(cum_a * nb - cum_b * na))
        max_float = max(max_float, abs(cum_a / na - cum_b / nb))
    assert abs(max_scaled / (na * nb) - max_float) < 1e-12


@given(
    st.sets(st.integers(min_value=0, max_value=200), min_size=1, max_size=80)
)
@settings(max_examples=200, deadline=None)
def test_backfill_islands_identity(missing):
    """The gaps-and-islands key (day − row_number) groups EXACTLY the
    maximal runs of consecutive integers, for arbitrary missing sets."""
    days = sorted(missing)
    groups: dict = {}
    for rn, d in enumerate(days, 1):
        groups.setdefault(d - rn, []).append(d)
    # every group is one contiguous run
    for run in groups.values():
        assert run == list(range(run[0], run[0] + len(run)))
    # runs are maximal: adjacent groups are separated by a gap > 1
    starts = sorted(r[0] for r in groups.values())
    ends = {r[0]: r[-1] for r in groups.values()}
    for a, b in zip(starts, starts[1:]):
        assert b > ends[a] + 1
    assert sum(len(r) for r in groups.values()) == len(days)
