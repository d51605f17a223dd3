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
