import numpy as np
import pytest

from nrtsearch_tpu.utils import smallfloat as sf


def test_exact_below_24():
    for i in range(24):
        assert sf.int_to_byte4(i) == i
        assert sf.byte4_to_int(sf.int_to_byte4(i)) == i


def test_monotone_and_lossy_above_24():
    prev = -1
    for i in [24, 25, 30, 40, 100, 1000, 10_000, 1_000_000, 2**31 - 1]:
        enc = int(sf.int_to_byte4(i))
        assert 0 <= enc <= 255
        assert enc >= prev
        prev = enc
        dec = int(sf.byte4_to_int(enc))
        assert dec <= i


def test_quantize_idempotent():
    vals = np.array([0, 1, 5, 23, 24, 37, 100, 12345, 999999])
    q1 = sf.quantize_length(vals)
    q2 = sf.quantize_length(q1)
    np.testing.assert_array_equal(q1, q2)


def test_roundtrip_buckets_nonoverlapping():
    # every decoded value must re-encode to the same byte
    for i in range(0, 200000, 37):
        enc = int(sf.int_to_byte4(i))
        dec = int(sf.byte4_to_int(enc))
        assert int(sf.int_to_byte4(dec)) == enc


def test_full_byte_range_decodes_monotone():
    decs = [int(sf.byte4_to_int(b)) for b in range(256)]
    assert decs == sorted(decs)
    assert decs[23] == 23
    assert decs[24] == 24


def test_negative_raises():
    with pytest.raises(ValueError):
        sf.int_to_byte4(-1)
