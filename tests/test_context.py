"""Window-scheduler parity with the reference algorithm
(src/pipelines/context.py:7-42) via an independent generator replica, plus
coverage properties."""

import numpy as np

from mimo_tpu.pipelines.context import (compute_windows, ordered_halving,
                                        window_list)


def _reference_uniform(step, num_frames, context_size, context_stride,
                       context_overlap, closed_loop=True):
    """Independent replica of the published AnimateDiff uniform scheduler
    semantics, used as the test oracle."""
    if num_frames <= context_size:
        yield list(range(num_frames))
        return
    context_stride = min(
        context_stride, int(np.ceil(np.log2(num_frames / context_size))) + 1)

    def oh(val):
        if val == 0:
            return 0.0
        b = f"{val:064b}"[::-1]
        return int(b, 2) / (1 << 64)

    for context_step in 1 << np.arange(context_stride):
        pad = int(round(num_frames * oh(step)))
        for j in range(
            int(oh(step) * context_step) + pad,
            num_frames + pad + (0 if closed_loop else -context_overlap),
            (context_size * context_step - context_overlap),
        ):
            yield [e % num_frames
                   for e in range(j, j + context_size * context_step,
                                  context_step)]


def test_ordered_halving_values():
    assert ordered_halving(0) == 0.0
    assert ordered_halving(1) == 0.5
    assert ordered_halving(2) == 0.25
    assert ordered_halving(3) == 0.75
    assert ordered_halving(4) == 0.125


def test_windows_match_reference_algorithm():
    for nf, cs, stride, ov, step in [
        (64, 24, 1, 4, 0), (64, 24, 3, 4, 0), (150, 24, 1, 4, 0),
        (30, 24, 1, 4, 0), (24, 24, 1, 4, 0), (8, 4, 1, 1, 0),
        (64, 24, 1, 4, 5), (100, 16, 2, 4, 7),
    ]:
        got = window_list(nf, cs, stride, ov, step)
        want = list(_reference_uniform(step, nf, cs, stride, ov))
        assert got == want, (nf, cs, stride, ov, step)


def test_every_frame_covered():
    for nf in [25, 30, 64, 150]:
        idx, w = compute_windows(nf, 24, 1, 4)
        covered = np.zeros(nf, bool)
        covered[idx.reshape(-1)] = True
        assert covered.all()
        assert (idx >= 0).all() and (idx < nf).all()
        assert w.shape == (idx.shape[0],)


def test_padding_to_multiple():
    idx, w = compute_windows(64, 24, 1, 4, pad_to_multiple=8)
    assert idx.shape[0] % 8 == 0
    assert w.sum() == len(window_list(64, 24, 1, 4))
    # padding windows are weight-0 copies
    assert (w[int(w.sum()):] == 0).all()


def test_short_clip_single_window():
    idx, w = compute_windows(8, 24, 1, 4)
    assert idx.shape == (1, 8)
    assert (idx[0] == np.arange(8)).all()
