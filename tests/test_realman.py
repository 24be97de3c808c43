"""RealMAN reader test against a synthetic directory in the RealMAN
layout (per-channel wavs, dp_speech tree, 10 Hz CSV streams, noise)."""
import os

import numpy as np
import pytest

from fnssl_tpu.data.realman import RealData
from fnssl_tpu.utils.audio_io import write_audio

FS = 16000


@pytest.fixture
def realman_dir(tmp_path, rng):
    nch = 9
    root = tmp_path
    ma = root / "ma_speech"
    dp = root / "dp_speech"
    noise = root / "noise"
    for d in (ma, dp, noise):
        os.makedirs(d)
    rows = ["filename,angle(°),distance"]
    for rec in range(3):
        n = int(6.0 * FS)  # 6 s (longer than the 4 s crop)
        base = rng.standard_normal(n).astype(np.float32) * 0.3
        for ch in range(nch):
            write_audio(str(ma / f"rec{rec}_CH{ch}.wav"),
                        base * (1 + 0.01 * ch), FS)
        write_audio(str(dp / f"rec{rec}.wav"), base, FS)
        if rec == 0:  # static
            rows.append(f"rec{rec}.wav,37.0,1.5")
        else:         # moving: 10 Hz streams for 6 s = 60 values
            angs = ",".join(str(30 + i) for i in range(60))
            diss = ",".join(f"{1.0 + 0.01 * i:.2f}" for i in range(60))
            rows.append(f'rec{rec}.wav,"{angs}","{diss}"')
    csv = root / "targets.csv"
    csv.write_text("\n".join(rows) + "\n")
    nz = rng.standard_normal((int(5 * FS),)).astype(np.float32) * 0.1
    for ch in range(nch):
        write_audio(str(noise / f"amb_CH{ch}.wav"), nz, FS)
    return str(ma) + os.sep, str(csv), str(noise)


def test_realman_single_source(realman_dir):
    ma, csv, noise = realman_dir
    ds = RealData(ma, [csv], noise, use_mic_id=[0, 1, 3, 5, 7],
                  max_source=1, ext="wav")
    assert len(ds) == 3
    sig, targets, vad, topo, dist = ds[(0, 123)]
    assert sig.shape == (4 * FS, 5)
    assert targets.shape == (40, 1) and (targets == 37.0).all()
    assert dist.shape == (40, 1) and (dist == 1.5).all()
    assert topo.shape == (5, 3)
    assert vad.shape == (40, 1) and vad.max() <= 1
    # per-item-seed reproducibility
    sig2, *_ = ds[(0, 123)]
    np.testing.assert_array_equal(sig, sig2)
    sig3, *_ = ds[(0, 124)]
    assert not np.array_equal(sig, sig3)


def test_realman_moving_source_streams(realman_dir):
    ma, csv, noise = realman_dir
    ds = RealData(ma, [csv], noise, use_mic_id=[0, 1, 2],
                  max_source=1, ext="wav")
    _, targets, _, _, dist = ds[(1, 7)]
    # the 10 Hz angle stream is a +1/frame ramp; crop must be a
    # contiguous 40-frame slice of it
    t = targets[:, 0]
    assert np.all(np.diff(t) == 1.0), t[:5]
    assert 30 <= t[0] <= 50


def test_realman_two_source_overlap(realman_dir):
    ma, csv, noise = realman_dir
    ds = RealData(ma, [csv], noise, use_mic_id=[0, 1, 2],
                  max_source=2, ext="wav")
    sig, targets, vad, topo, dist = ds[(0, 5)]
    assert targets.shape == (40, 2)
    assert vad.shape == (40, 2)
    assert sig.shape == (4 * FS, 3)
    assert np.isfinite(sig).all()


def test_realman_variable_array(realman_dir):
    ma, csv, noise = realman_dir
    ds = RealData(ma, [csv], noise, is_variable_array=True,
                  max_source=1, ext="wav")
    # variable-array mode needs all 27 candidate channels on disk; our
    # fixture has 9, so just exercise the selector determinism
    rng = np.random.default_rng(3)
    ids1, topo1 = ds.select_mic_array_9mic(np.random.default_rng(3))
    ids2, topo2 = ds.select_mic_array_9mic(np.random.default_rng(3))
    assert ids1 == ids2 and 2 <= len(ids1) <= 8
    ids3, _ = ds.select_mic_array_no_circle(np.random.default_rng(4))
    assert set(ids3) not in ({0, 2, 4, 6, 24}, {1, 3, 5, 7, 24})


def test_realman_decoded_cache_bit_identical(realman_dir, tmp_path,
                                             monkeypatch):
    """cache_dir mode (VERDICT r4 #6): items are bit-for-bit identical
    to uncached mode under the same per-item seed, and after the first
    pass every audio read is served from the cache (zero decodes)."""
    import fnssl_tpu.data.realman as rm

    ma, csv, noise = realman_dir
    kw = dict(use_mic_id=[0, 1, 3, 5, 7], max_source=2, ext="wav")
    cache = str(tmp_path / "decoded")
    ds_plain = RealData(ma, [csv], noise, **kw)
    ds_cached = RealData(ma, [csv], noise, cache_dir=cache, **kw)

    items = [(i, 1000 + 7 * i) for i in range(3)]
    for idx_seed in items:          # first pass populates the cache
        a = ds_plain[idx_seed]
        b = ds_cached[idx_seed]
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert len(os.listdir(cache)) > 0

    calls = {"n": 0}
    real = rm.read_audio

    def counting(path):
        calls["n"] += 1
        return real(path)

    monkeypatch.setattr(rm, "read_audio", counting)
    c = ds_cached[items[0]]         # second pass: pure cache hits
    assert calls["n"] == 0
    for x, y in zip(ds_plain[items[0]], c):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_realman_cache_concurrent_decode(realman_dir, tmp_path):
    """Two loader THREADS decoding the same uncached channel must both
    succeed (regression: a pid-only tmp name collided across threads —
    the first os.replace consumed the shared tmp and the second raised
    FileNotFoundError; observed live in the r5 cached RealMAN fit)."""
    import threading

    ma, csv, noise = realman_dir
    ds = RealData(ma, [csv], noise, cache_dir=str(tmp_path / "dec"),
                  use_mic_id=[0, 1, 3, 5, 7], max_source=2, ext="wav")
    path = os.path.join(str(ma), "rec0_CH0.wav")
    barrier = threading.Barrier(4)
    errs = []

    def hit():
        try:
            barrier.wait()
            for _ in range(5):
                ds._read_cached(path)
        except Exception as e:       # pragma: no cover - the regression
            errs.append(e)

    threads = [threading.Thread(target=hit) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    a, fs = ds._read_cached(path)
    b, fs2 = ds._read_cached(path)
    assert fs == fs2 == FS
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
