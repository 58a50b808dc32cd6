"""Token-frame math: the 7-token -> (1,2,4) codebook contract.

Parity targets: reference speechpipe.py:84-98 (layout), :146-189 (id math).
"""
import numpy as np
import pytest

from project_morpheus_tpu.codec import frames as F


def test_tokens_to_codes_layout():
    # One frame: positions [0..6] -> c0=[0], c1=[1,4], c2=[2,3,5,6]
    toks = np.arange(7)
    c0, c1, c2 = F.tokens_to_codes(toks)
    assert c0.tolist() == [0]
    assert c1.tolist() == [1, 4]
    assert c2.tolist() == [2, 3, 5, 6]


def test_tokens_to_codes_multiframe_and_batch():
    toks = np.arange(28).reshape(2, 14)  # batch of 2, 2 frames each
    c0, c1, c2 = F.tokens_to_codes(toks)
    assert c0.shape == (2, 2) and c1.shape == (2, 4) and c2.shape == (2, 8)
    # second frame of first row starts at 7
    assert c0[0].tolist() == [0, 7]
    assert c1[0].tolist() == [1, 4, 8, 11]
    assert c2[0].tolist() == [2, 3, 5, 6, 9, 10, 12, 13]


def test_roundtrip():
    rng = np.random.default_rng(0)
    toks = rng.integers(0, 4096, size=(3, 35))
    c0, c1, c2 = F.tokens_to_codes(toks)
    back = F.codes_to_tokens(c0, c1, c2)
    np.testing.assert_array_equal(back, toks)


def test_custom_token_id_math():
    # reference speechpipe.py:181: id = N - 10 - (idx % 7) * 4096
    for pos in range(14):
        n = 10 + (pos % 7) * 4096 + 123
        assert F.audio_code_from_custom_number(n, pos) == 123
        assert F.custom_number_from_audio_code(123, pos) == n


def test_parse_custom_token():
    assert F.parse_custom_token("<custom_token_17>", 0) == 7
    # position band shifting
    assert F.parse_custom_token("<custom_token_4219>", 1) == 113
    # takes the last token in a merged string (reference rfind semantics)
    assert F.parse_custom_token("foo<custom_token_5><custom_token_17>", 0) == 7
    assert F.parse_custom_token("hello", 0) is None
    assert F.parse_custom_token("<custom_token_17>tail", 0) is None


def test_codes_valid_range():
    assert F.codes_valid([0, 4095, 4096])  # inclusive 4096 kept for parity
    assert not F.codes_valid([-1])
    assert not F.codes_valid([4097])
