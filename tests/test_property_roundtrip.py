"""Property-based round-trip tests (SURVEY.md §5.2-2): randomized (seeded)
column vectors per type profile → bit-identical reconstruction, mirroring
the reference's identity contract (§2.3-1). Hypothesis shrinks failures to
minimal counterexamples."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from parquet2csv_spark.codecs import decode_array, encode_array, raw_size, selector

_SETTINGS = dict(max_examples=60, deadline=None)


@settings(**_SETTINGS)
@given(
    st.lists(st.one_of(st.none(), st.integers(-(2 ** 63), 2 ** 63 - 1)), max_size=300),
    st.sampled_from(["plain", "for", "rle", "for+z"]),
)
def test_int64_roundtrip(vals, spec):
    arr = pa.array(vals, type=pa.int64())
    assert decode_array(encode_array(arr, spec)).equals(arr)


@settings(**_SETTINGS)
@given(
    st.lists(st.one_of(st.none(), st.text(max_size=80)), max_size=200),
    st.sampled_from(["plain", "fsst", "dict:plain", "rledict:plain", "plain+z", "dict:fsst+z"]),
)
def test_string_roundtrip(vals, spec):
    arr = pa.array(vals, type=pa.string())
    out = decode_array(encode_array(arr, spec))
    assert out.cast(pa.string()).equals(arr)


@settings(**_SETTINGS)
@given(st.lists(st.one_of(st.none(), st.binary(max_size=64)), max_size=150))
def test_binary_roundtrip_selector(vals):
    arr = pa.array(vals, type=pa.binary())
    spec, frame = selector.encode_best(arr)
    assert decode_array(frame).cast(pa.binary()).equals(arr)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.floats(allow_nan=True, allow_infinity=True, width=64),
        ),
        max_size=200,
    )
)
def test_float_roundtrip_bitexact(vals):
    arr = pa.array(vals, type=pa.float64())
    out = decode_array(encode_array(arr, "plain+z"))
    assert out.is_null().equals(arr.is_null())
    a = arr.fill_null(0.0).to_numpy(zero_copy_only=False)
    b = out.fill_null(0.0).to_numpy(zero_copy_only=False)
    # bit-exact including NaN payloads and signed zeros
    assert np.array_equal(a.view(np.uint64), b.view(np.uint64))


@settings(**_SETTINGS)
@given(
    st.lists(
        st.one_of(st.none(), st.lists(st.floats(width=32, allow_nan=False, allow_infinity=False), max_size=8)),
        max_size=60,
    )
)
def test_list_float_roundtrip(vals):
    arr = pa.array(vals, type=pa.list_(pa.float32()))
    out = decode_array(encode_array(arr, "list"))
    assert out.cast(arr.type).equals(arr)


@settings(max_examples=25, deadline=None)
@given(st.binary(min_size=0, max_size=5000))
def test_fsst_any_bytes_roundtrip(blob):
    from parquet2csv_spark.codecs import fsst

    merges = fsst.train(blob)
    assert fsst.decompress(fsst.compress(blob, merges), merges) == blob


@settings(max_examples=30, deadline=None)
@given(st.data())
def test_selector_never_worse_than_plain_much(data):
    vals = data.draw(st.lists(st.text(max_size=40), min_size=1, max_size=120))
    arr = pa.array(vals, type=pa.string())
    spec, frame = selector.encode_best(arr)
    plain = encode_array(arr, "plain")
    assert len(frame) <= len(plain) + 64  # header slack only
    assert decode_array(frame).cast(pa.string()).equals(arr)


@settings(**_SETTINGS)
@given(
    st.lists(st.one_of(st.none(), st.integers(-(2 ** 63), 2 ** 63 - 1)), max_size=300),
)
def test_delta_roundtrip_any_ints(vals):
    # delta must be exact for ARBITRARY ints (wraparound cancels), not
    # just the sorted data the selector picks it for
    arr = pa.array(vals, type=pa.int64())
    assert decode_array(encode_array(arr, "delta")).equals(arr)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.one_of(st.none(), st.floats(allow_nan=True, allow_infinity=True, width=64)),
        max_size=200,
    )
)
def test_alp_roundtrip_any_floats_bitexact(vals):
    # alp's verify-at-encode exception path must make it exact for ANY
    # doubles — NaN payloads, infinities, -0.0, subnormals included
    arr = pa.array(vals, type=pa.float64())
    out = decode_array(encode_array(arr, "alp"))
    assert out.is_null().equals(arr.is_null())
    a = arr.fill_null(0.0).to_numpy(zero_copy_only=False).view(np.int64)
    b = out.fill_null(0.0).to_numpy(zero_copy_only=False).view(np.int64)
    assert (a == b).all()


@settings(**_SETTINGS)
@given(
    st.lists(
        st.one_of(st.none(), st.floats(allow_nan=True, allow_infinity=True, width=32)),
        max_size=200,
    )
)
def test_alp_roundtrip_any_float32_bitexact(vals):
    arr = pa.array(vals, type=pa.float32())
    out = decode_array(encode_array(arr, "alp"))
    assert out.is_null().equals(arr.is_null())
    a = arr.fill_null(0.0).to_numpy(zero_copy_only=False).view(np.int32)
    b = out.fill_null(0.0).to_numpy(zero_copy_only=False).view(np.int32)
    assert (a == b).all()
