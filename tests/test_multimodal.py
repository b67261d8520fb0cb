from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from signal_messenger_vector_database_spark.operators.multimodal import (
    _pil,
    attach_binary,
    decode_image,
    extract_features,
    fake_features,
    real_features,
    sample_frames,
)

SF = "/root/testdata/sf0.001"


def test_attach_binary_metadata(spark):
    df = spark.createDataFrame([(1, "héllo")], "doc_id long, text string")
    row = attach_binary(df).first()
    assert bytes(row.payload) == "héllo".encode("utf-8")
    assert row.meta.n_bytes == 6  # multibyte é
    assert row.meta.mime == "text/plain"


@pytest.mark.skipif(_pil() is not None, reason="Pillow installed: decode is real")
def test_decode_raises_without_pil():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


@pytest.mark.skipif(_pil() is None, reason="Pillow not in this container")
def test_decode_and_real_features_with_pil():
    """The PIL-gated real path: decode a generated 4x4 RGB PNG and assert
    the real featurizer is shape/dtype-interchangeable with the fake one
    behind the same seam (r6 VERDICT task 4)."""
    import io

    Image = _pil()
    im = Image.new("RGB", (4, 4), (200, 10, 10))
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    png = buf.getvalue()
    px = decode_image(png)
    assert px.shape == (4, 4, 3) and px.dtype == np.uint8
    real = real_features(png, bins=16)
    fake = fake_features(png, bins=16)
    assert real.shape == fake.shape and real.dtype == fake.dtype
    assert abs(float(real.sum()) - 1.0) < 1e-5


def test_fake_features_shape_and_mass():
    f = fake_features(b"some bytes here", bins=16)
    assert f.shape == (16,)
    assert abs(float(f.sum()) - 1.0) < 1e-5
    assert np.array_equal(f, fake_features(b"some bytes here", bins=16))
    assert fake_features(b"", bins=16).sum() == 0.0


def test_extract_features_df(spark):
    df = attach_binary(
        spark.createDataFrame([(i, f"text {i}") for i in range(5)], "doc_id long, text string")
    )
    # featurizer pinned: these payloads are text bytes, and the auto path
    # would (correctly) try a real image decode wherever Pillow exists
    out = extract_features(df, featurizer=fake_features).collect()
    assert len(out) == 5
    assert all(len(r.features) == 16 for r in out)


def test_sample_frames_explodes_deterministically(spark):
    df = attach_binary(
        spark.createDataFrame([(i, "x" * (10 + i)) for i in range(4)], "doc_id long, text string")
    )
    frames = sample_frames(df).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i in range(4):
        expected_n = ((10 + i) % 3) + 1
        assert len(by_doc[i]) == expected_n
        assert [r.frame_id for r in sorted(by_doc[i], key=lambda r: r.frame_id)] == list(range(expected_n))


def test_stub_resize_arithmetic_and_batch_shape(spark):
    """stub_resize keeps every stride-th byte; the mapInPandas stage must
    reproduce exactly ceil(n/stride) bytes per doc and preserve 1:1 row
    cardinality."""
    from signal_messenger_vector_database_spark.operators.multimodal import (
        attach_binary,
        resize_batch,
        stub_resize,
    )
    from signal_messenger_vector_database_spark.io.sources import load_table

    docs = load_table(spark, SF, "documents").limit(50)
    out = resize_batch(attach_binary(docs)).collect()
    assert len(out) == 50
    strides = set()
    for r in out:
        stride = max(1, r.orig_len // 64)
        strides.add(stride)
        assert len(r.resized) == (r.orig_len + stride - 1) // stride
        assert r.method == "stub"
    # the fixture must exercise stride > 1, or the arithmetic is vacuous
    assert max(strides) > 1
    assert stub_resize(b"abcdefgh", 2, 2) == b"abcdefgh"[::2]


@pytest.mark.skipif(_pil() is None, reason="Pillow not in this container")
def test_real_resize_with_pil():
    """The production arm: a real 4x4 PNG resized to 2x2 decodes back at
    the target dimensions."""
    import io

    import numpy as np
    from PIL import Image

    from signal_messenger_vector_database_spark.operators.multimodal import (
        decode_image,
        resize_image,
    )

    buf = io.BytesIO()
    Image.fromarray(
        (np.arange(48, dtype=np.uint8).reshape(4, 4, 3))
    ).save(buf, format="PNG")
    resized = resize_image(buf.getvalue(), 2, 2)
    assert decode_image(resized).shape == (2, 2, 3)
