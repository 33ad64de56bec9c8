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


@settings(max_examples=300)
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


@settings(max_examples=300)
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
