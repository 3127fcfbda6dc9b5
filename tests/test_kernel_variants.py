"""Golden tests for the v2016 and ronomon kernel variants, ported from the
reference suites (src/v2016/mod.rs tests, src/ronomon/mod.rs tests)."""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

from fastcdc_rs_spark.kernel import chunk_bytes, ChunkerConfig
from fastcdc_rs_spark.kernel.ronomon import (
    TABLE,
    center_size,
    chunk_bytes_ronomon,
    mask,
)
from fastcdc_rs_spark.kernel.v2016 import chunk_bytes_v2016

FIXTURE = Path("/root/reference/test/fixtures/SekienAkashita.jpg")


@pytest.fixture(scope="module")
def sekien() -> bytes:
    return FIXTURE.read_bytes()


# ------------------------------ v2016 --------------------------------------

V2016_GOLDENS = [
    # (min, avg, max, level, [(hash, length), ...]) — src/v2016/mod.rs tests
    (4096, 16384, 65535, 1, [
        (17968276318003433923, 21325),
        (4098594969649699419, 17140),
        (15733367461443853673, 28084),
        (4509236223063678303, 18217),
        (2504464741100432583, 24700),
    ]),
    (8192, 32768, 131072, 1, [
        (15733367461443853673, 66549),
        (2504464741100432583, 42917),
    ]),
    (16384, 65536, 262144, 1, [(2504464741100432583, 109466)]),
    (4096, 16384, 65535, 0, [
        (221561130519947581, 6634),
        (15733367461443853673, 59915),
        (10460176299449652894, 25597),
        (6197802202431009942, 5237),
        (2504464741100432583, 12083),
    ]),
    (4096, 16384, 65535, 3, [
        (14582375164208481996, 17350),
        (13104072099671895560, 19911),
        (6161241554519610597, 17426),
        (16009206469796846404, 17519),
        (10460176299449652894, 19940),
        (2504464741100432583, 17320),
    ]),
]


@pytest.mark.parametrize("mn,avg,mx,level,expected", V2016_GOLDENS)
def test_v2016_goldens(sekien, mn, avg, mx, level, expected):
    chunks = chunk_bytes_v2016(sekien, mn, avg, mx, level)
    assert [(h, ln) for h, _, ln in chunks] == expected


def test_v2016_all_zeros():
    # src/v2016/mod.rs test_cut_all_zeros: same constant hash as v2020
    chunks = chunk_bytes_v2016(bytes(10240), 64, 256, 1024)
    assert len(chunks) == 10
    assert all(h == 14169102344523991076 and ln == 1024 for h, _, ln in chunks)


def test_v2016_v2020_same_cut_points(sekien):
    # the reference's own cross-property: identical lengths, some hashes differ
    a = chunk_bytes_v2016(sekien, 4096, 16384, 65535)
    b = chunk_bytes(sekien, ChunkerConfig(4096, 16384, 65535))
    assert [(o, ln) for _, o, ln in a] == [(o, ln) for _, o, ln in b]


# ------------------------------ ronomon ------------------------------------

def test_ronomon_table_pinned():
    # first literals of src/ronomon/mod.rs:246-249 (AES-CTR recipe)
    assert [int(x) for x in TABLE[:8]] == [
        0x5C95C078, 0x22408989, 0x2D48A214, 0x12842087,
        0x530F8AFB, 0x474536B9, 0x2963B4F1, 0x44CB738B,
    ]
    assert int(TABLE.max()) < 2**31


def test_ronomon_helpers():
    # src/ronomon/mod.rs:295-320
    assert center_size(50, 100, 50) == 0
    assert center_size(200, 100, 50) == 50
    assert center_size(200, 100, 40) == 40
    assert mask(24) == 16_777_215
    assert mask(16) == 65535
    assert mask(10) == 1023
    assert mask(8) == 255


def test_ronomon_all_zeros():
    chunks = chunk_bytes_ronomon(bytes(10240), 64, 256, 1024)
    assert len(chunks) == 10
    assert all(h == 3106636015 and ln == 1024 for h, _, ln in chunks)


def test_ronomon_sekien_16k(sekien):
    chunks = chunk_bytes_ronomon(sekien, 8192, 16384, 32768)
    assert [(h, o, ln) for h, o, ln in chunks] == [
        (1527472128, 0, 22366),
        (1174757376, 22366, 8282),
        (2687197184, 30648, 16303),
        (1210105856, 46951, 18696),
        (2984739645, 65647, 32768),
        (1121740051, 98415, 11051),
    ]


def test_ronomon_sekien_32k_64k(sekien):
    chunks = chunk_bytes_ronomon(sekien, 16384, 32768, 65536)
    assert [(h, o, ln) for h, o, ln in chunks] == [
        (2772598784, 0, 32857),
        (1651589120, 32857, 16408),
        (1121740051, 49265, 60201),
    ]
    chunks = chunk_bytes_ronomon(sekien, 32768, 65536, 131072)
    assert [(h, o, ln) for h, o, ln in chunks] == [
        (2772598784, 0, 32857),
        (1121740051, 32857, 76609),
    ]


def test_ronomon_with_eof_streaming(sekien):
    # src/ronomon/mod.rs:421-469 — buffered multi-block protocol
    chunk_offsets = [0, 22366, 30648, 46951, 65647, 98415]
    chunk_sizes = [22366, 8282, 16303, 18696, 32768, 11051]
    buf_size = 32768
    file_size = len(sekien)
    file_pos = 0
    idx = 0
    for group_size in (2, 1, 1, 1, 1):
        upper = file_pos + buf_size
        if upper >= file_size:
            eof, chunk = True, sekien[file_pos:]
        else:
            eof, chunk = False, sekien[file_pos:upper]
        results = chunk_bytes_ronomon(chunk, 8192, 16384, 32768, eof=eof)
        assert len(results) == group_size
        for h, off, ln in results:
            assert off + file_pos == chunk_offsets[idx]
            assert ln == chunk_sizes[idx]
            idx += 1
        file_pos += sum(ln for _, _, ln in results)
    assert file_pos == file_size
