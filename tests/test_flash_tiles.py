"""Transposed-flash tile chooser (ops/flash_attention._t_tiles).

Pins the measured-best tiles for the four self-attention protocol shapes
(tools/sweep_flash_t.py, v5e, .bench_logs/sweep_flash_t_r4.out) and the
legality invariants of the heuristic fallback: Mosaic's tile rule needs
both tiles to be multiples of 128 (bq is the lane dim of every VPU op, bk
the lane dim of the pre-transposed V^T tile), and the f32 score tile must
fit the ~8 MB scoped-VMEM budget.
"""

import pytest

from motionrag_tpu.ops.flash_attention import _T_TILE_TABLE, _ceil_to, _t_tiles


@pytest.mark.parametrize(
    "s,expect",
    [
        (6976, (1792, 640)),    # CogVideoX 17f joint attn: r5 micro-sweep
        (17776, (1280, 1280)),  # CogVideoX 49f joint attn: 94.9
        (9216, (1536, 768)),    # DC/SVD L0 spatial:        94.4
        (2304, (1152, 768)),    # DC/SVD L1 spatial:        95.2 (was 43.1:
                                # the old static tile padded 2304->3072 on
                                # both axes, 78% wasted MXU work)
    ],
)
def test_protocol_shapes_use_measured_best(s, expect):
    assert _t_tiles(s, s) == expect


def test_heuristic_reproduces_measured_best_at_zero_pad_shapes():
    """The padding-min + (larger bq, smaller bk) tie-break picks exactly
    the swept winner at both zero-padding shapes — evidence the fallback
    generalizes to unswept shapes."""
    saved = dict(_T_TILE_TABLE)
    try:
        _T_TILE_TABLE.clear()
        assert _t_tiles(9216, 9216) == (1536, 768)
        assert _t_tiles(2304, 2304) == (1152, 768)
    finally:
        _T_TILE_TABLE.update(saved)


@pytest.mark.parametrize(
    "q_len,kv_len",
    [(1024, 1024), (3333, 3333), (4096, 333), (12800, 12800), (7040, 7040),
     (2048, 8192)],
)
def test_heuristic_tiles_are_legal(q_len, kv_len):
    bq, bk = _t_tiles(q_len, kv_len)
    assert bq % 128 == 0 and bk % 128 == 0  # Mosaic lane-dim tile rule
    assert bq * bk * 4 <= 8 * 2 ** 20       # f32 score tile VMEM budget
    assert 896 <= bq <= 1792 and 768 <= bk <= 1280


def test_heuristic_minimizes_padding():
    # 7040 = 5 x 1408 is not reachable (1408 tiles lose on geometry and are
    # not in the candidate range's best), but whatever is chosen must pad
    # no worse than the old static default padded the same shape
    for s in (6976, 2304, 5000, 11111):
        bq, bk = _t_tiles(s + 1, s + 1)  # off-table
        new = _ceil_to(s + 1, bq) * _ceil_to(s + 1, bk)
        old = _ceil_to(s + 1, 1536) * _ceil_to(s + 1, 1024)
        assert new <= old
