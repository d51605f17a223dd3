"""Multimodal plumbing: schema, actor signature, stub behavior."""

import numpy as np
import pytest
import ray.data as rd

from ts_type_filter_ray.functions.multimodal import (FEATURE_DIM, FakeDecoder,
                                                     FrameSampleStage,
                                                     MediaDecodeStage,
                                                     decode_media, real_decode,
                                                     synthesize_media_table)


def test_real_decode_is_stub():
    with pytest.raises(NotImplementedError, match="decoder"):
        real_decode(b"xx", "image", {})


def test_fake_decoder_deterministic():
    d = FakeDecoder()
    a = d(b"payload", "image", {})
    b = d(b"payload", "image", {})
    assert np.array_equal(a, b)
    assert a.shape == (FEATURE_DIM,)
    assert a.dtype == np.float32
    assert not np.array_equal(a, d(b"other", "image", {}))


def test_decode_media_pipeline(ray_session):
    tbl = synthesize_media_table(30)
    out = decode_media(rd.from_arrow(tbl), decoder=FakeDecoder(),
                       batch_size=8, concurrency=2)
    rows = out.take_all()
    assert len(rows) == 30
    for r in rows:
        assert len(r["features"]) == FEATURE_DIM
        assert r["n_bytes"] > 0
    # deterministic across runs
    rows2 = decode_media(rd.from_arrow(tbl), decoder=FakeDecoder(),
                         batch_size=8, concurrency=2).take_all()
    key = lambda r: r["item_id"]
    assert sorted([(r["item_id"], tuple(r["features"])) for r in rows],
                  key=lambda t: t[0]) == \
           sorted([(r["item_id"], tuple(r["features"])) for r in rows2],
                  key=lambda t: t[0])


def test_default_decoder_surfaces_stub_error(ray_session):
    tbl = synthesize_media_table(3)
    with pytest.raises(Exception, match="decoder|NotImplemented"):
        decode_media(rd.from_arrow(tbl), batch_size=2,
                     concurrency=1).take_all()


def test_frame_sampling(ray_session):
    tbl = synthesize_media_table(9)
    video = rd.from_arrow(tbl).filter(lambda r: r["kind"] == "video")
    frames = video.map_batches(FrameSampleStage,
                               fn_constructor_args=(2, 128),
                               batch_format="pyarrow",
                               concurrency=1).take_all()
    assert frames
    for f in frames:
        assert f["frame_idx"] % 2 == 0
        assert isinstance(f["frame"], bytes)


def test_resize_media_shapes(ray_session):
    import numpy as np
    import ray.data as rd

    from ts_type_filter_ray.functions.multimodal import (
        ResizeStage, _nearest_resize, resize_media, synthesize_media_table)

    out = resize_media(rd.from_arrow(synthesize_media_table(24)),
                       target_h=8, target_w=8, batch_size=8,
                       concurrency=2).take_all()
    assert len(out) == 24
    for r in out:
        assert (r["height"], r["width"]) == (8, 8)
        assert len(r["resized"]) == 64
    # deterministic across runs
    again = resize_media(rd.from_arrow(synthesize_media_table(24)),
                         target_h=8, target_w=8).take_all()
    assert sorted((r["item_id"], r["resized"]) for r in out) == \
           sorted((r["item_id"], r["resized"]) for r in again)
    # the fake kernel is honest nearest-neighbor index arithmetic
    g = np.arange(48, dtype=np.uint8).reshape(6, 8)
    small = _nearest_resize(g, 2, 2)
    assert small.tolist() == [[g[0, 0], g[0, 4]], [g[3, 0], g[3, 4]]]


def test_resize_real_kernel_is_honest_stub(ray_session):
    import numpy as np
    import pytest as _pytest

    from ts_type_filter_ray.functions.multimodal import real_resize
    with _pytest.raises(NotImplementedError):
        real_resize(np.zeros((4, 4), dtype=np.uint8), 2, 2)


def test_frame_sample_rows(ray_session):
    import ray.data as rd

    from ts_type_filter_ray.functions.multimodal import (
        frame_sample, synthesize_media_table)
    tbl = synthesize_media_table(12)
    out = frame_sample(rd.from_arrow(tbl), every_k=4,
                       frame_bytes=128).take_all()
    by_item = {}
    for r in out:
        by_item.setdefault(r["item_id"], []).append(r["frame_idx"])
    payloads = {i: p for i, p in zip(tbl["item_id"].to_pylist(),
                                     tbl["payload"].to_pylist())}
    for item, idxs in by_item.items():
        n_frames = max(1, len(payloads[item]) // 128)
        assert sorted(idxs) == list(range(0, n_frames, 4))
