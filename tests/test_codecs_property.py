"""Property-based codec tests (hypothesis): decode(encode(x)) == x for
arbitrary inputs — a rigor upgrade over the reference's golden-file
strategy (SURVEY §5 notes it has no property-based testing)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st
from mojap_arrow_pd_parser_spark.functions.codecs import (
    decode_array,
    decode_int,
    encode_array,
    encode_int,
)
from mojap_arrow_pd_parser_spark.functions.codecs import fsst

SETTINGS = dict(max_examples=60, deadline=None)


@st.composite
def any_int_array(draw):
    dtype = draw(
        st.sampled_from(
            [np.int8, np.int16, np.int32, np.int64, np.uint8, np.uint16, np.uint32, np.uint64]
        )
    )
    info = np.iinfo(dtype)
    vals = draw(
        st.lists(st.integers(int(info.min), int(info.max)), min_size=0, max_size=300)
    )
    return np.array(vals, dtype=dtype)


@given(any_int_array(), st.sampled_from(["plain", "ffor", "delta", "delta2", "rle", "dict"]))
@settings(**SETTINGS)
def test_int_codec_roundtrip_property(a, codec):
    meta, payload = encode_int(a, codec=codec)
    out = decode_int(meta, payload)
    assert out.dtype == a.dtype
    np.testing.assert_array_equal(a, out)


@given(st.binary(min_size=0, max_size=2000))
@settings(**SETTINGS)
def test_fsst_roundtrip_property(data):
    table = fsst.train(data)
    codes, lits = fsst.encode(data, table)
    assert fsst.decode(codes, lits, table) == data


@given(
    st.lists(
        st.one_of(st.none(), st.lists(st.integers(-(2**31), 2**31 - 1), max_size=60)),
        min_size=0,
        max_size=120,
    )
)
@settings(**SETTINGS)
def test_list_column_roundtrip_property(rows):
    arr = pa.array(rows, type=pa.list_(pa.int32()))
    meta, payload = encode_array(arr)
    assert decode_array(meta, payload).equals(arr)


@given(
    st.lists(
        st.one_of(st.none(), st.text(max_size=40), st.just("")),
        min_size=0,
        max_size=150,
    )
)
@settings(**SETTINGS)
def test_string_column_roundtrip_property(rows):
    arr = pa.array(rows, type=pa.string())
    meta, payload = encode_array(arr)
    assert decode_array(meta, payload).equals(arr)


@given(
    st.lists(
        st.one_of(
            st.none(),
            st.floats(width=32, allow_nan=False),
            st.just(float("inf")),
        ),
        min_size=0,
        max_size=200,
    )
)
@settings(**SETTINGS)
def test_float_column_roundtrip_property(rows):
    arr = pa.array(rows, type=pa.float32())
    meta, payload = encode_array(arr)
    assert decode_array(meta, payload).equals(arr)


@given(
    st.lists(
        st.one_of(
            st.none(),
            st.decimals(
                min_value=-(10**28), max_value=10**28, places=4,
                allow_nan=False, allow_infinity=False,
            ),
        ),
        min_size=0,
        max_size=200,
    )
)
@settings(**SETTINGS)
def test_decimal_roundtrip_property(vals):
    arr = pa.array(vals, type=pa.decimal128(38, 4))
    meta, payload = encode_array(arr)
    out = decode_array(meta, payload)
    assert out.equals(arr)


# ---------------------------------------------------------------------------
# Media container codecs (round 6): the library-free BMP/WAV/AVI
# parsers feed the REAL fake=False multimodal paths, so they get the
# same property rigor as the columnar codecs.
# ---------------------------------------------------------------------------

from mojap_arrow_pd_parser_spark.operators import multimodal as mm  # noqa: E402


@st.composite
def rgb_frames(draw, max_frames=1):
    n = draw(st.integers(1, max_frames))
    h = draw(st.integers(1, 24))
    w = draw(st.integers(1, 24))
    data = draw(
        st.binary(min_size=n * h * w * 3, max_size=n * h * w * 3)
    )
    return np.frombuffer(data, dtype=np.uint8).reshape(n, h, w, 3)


@given(rgb_frames())
@settings(**SETTINGS)
def test_bmp_roundtrip_property(frames):
    px = frames[0]
    assert (mm.decode_bmp(mm.encode_bmp(px)) == px).all()


@given(rgb_frames(max_frames=6), st.integers(1, 60))
@settings(**SETTINGS)
def test_avi_roundtrip_property(frames, fps):
    back, back_fps = mm.decode_avi(mm.encode_avi(frames, fps))
    assert back_fps == fps
    assert back.shape == frames.shape
    assert (back == frames).all()


@st.composite
def pcm_samples(draw):
    dtype = draw(st.sampled_from([np.int16, np.uint8]))
    n = draw(st.integers(1, 400))
    n_ch = draw(st.integers(1, 3))
    info = np.iinfo(dtype)
    data = draw(st.binary(
        min_size=n * n_ch * info.bits // 8,
        max_size=n * n_ch * info.bits // 8,
    ))
    return np.frombuffer(data, dtype=dtype).reshape(n, n_ch)


@given(pcm_samples(), st.integers(1, 192_000))
@settings(**SETTINGS)
def test_wav_roundtrip_property(samples, rate):
    back, back_rate = mm.decode_wav(mm.encode_wav(samples, rate))
    assert back_rate == rate
    assert back.dtype == samples.dtype
    assert (back == samples).all()
