"""Native parser vs pure-Python parsers."""

import numpy as np
import pytest

from fgdp_tpu.io import native
from fgdp_tpu.io.sam import SamHeader, parse_sam_records
from fgdp_tpu.utils import dna


@pytest.fixture(scope="module")
def lib():
    lb = native.get_lib()
    if lb is None:
        pytest.skip("native library unavailable")
    return lb


def test_fastq_native(lib, rng):
    recs = []
    for i in range(50):
        L = int(rng.integers(30, 120))
        seq = "".join("ACGTN"[c] for c in rng.integers(0, 5, L))
        q = "".join(chr(33 + int(x)) for x in rng.integers(0, 40, L))
        recs.append(f"@read{i} comment here\n{seq}\n+\n{q}\n")
    data = "".join(recs).encode()
    names, codes, quals, lens, consumed = native.parse_fastq_chunk(
        data, 64, 128)
    assert len(names) == 50
    assert consumed == len(data)
    for i in range(50):
        line = recs[i].split("\n")
        assert names[i] == f"read{i}"
        L = len(line[1])
        assert lens[i] == min(L, 128)
        exp = dna.encode(line[1])
        np.testing.assert_array_equal(codes[i, :lens[i]], exp[:lens[i]])
        expq = np.frombuffer(line[3].encode(), np.uint8) - 33
        np.testing.assert_array_equal(quals[i, :lens[i]], expq[:lens[i]])


def test_fastq_native_partial_record(lib):
    data = b"@a\nACGT\n+\nIIII\n@b\nACG"
    names, codes, quals, lens, consumed = native.parse_fastq_chunk(
        data, 8, 16)
    assert names == ["a"]
    assert consumed == 15


def test_sam_numeric_native(lib, rng):
    header = SamHeader.parse(["@SQ\tSN:c1\tLN:100000"])
    lines = []
    for i in range(40):
        tile, x, y = (int(rng.integers(1, 999)), int(rng.integers(1, 30000)),
                      int(rng.integers(1, 30000)))
        q = "".join(chr(33 + int(v)) for v in rng.integers(0, 41, 60))
        cig = ["60M", "5S50M5S", "10H40M2I8M", "30M100D30M", "*"][i % 5]
        flag = [0, 16, 99, 147, 4][i % 5]
        pos = int(rng.integers(1, 90000)) if flag != 4 else 0
        lines.append("\t".join(
            [f"I1:2:FC:3:{tile}:{x}:{y}", str(flag),
             "c1" if flag != 4 else "*", str(pos), "37", cig, "*", "0",
             "0", "A" * 60, q]))
    data = ("\n".join(["@SQ\tSN:c1\tLN:100000"] + lines) + "\n").encode()
    out = native.parse_sam_numeric(data, 64)
    recs = parse_sam_records(lines, header)
    assert len(out["flag"]) == len(recs)
    np.testing.assert_array_equal(out["flag"], recs.flag)
    np.testing.assert_array_equal(out["pos"] - 1, recs.pos)
    np.testing.assert_array_equal(out["score"], recs.score)
    np.testing.assert_array_equal(out["tile"], recs.tile)
    np.testing.assert_array_equal(out["tx"], recs.tx)
    np.testing.assert_array_equal(out["ty"], recs.ty)
    # prime5 reconstruction from the numeric fields
    from fgdp_tpu.io.sam import FREVERSE
    kt = header.ktable()
    uc = np.where(recs.rid >= 0, kt[np.maximum(recs.rid, 0)] + recs.pos,
                  kt[-1])
    has_cig = np.array([len(c) > 0 for c in recs.cigars])
    fwd = (recs.flag & FREVERSE) == 0
    p5 = np.where(~has_cig, uc,
                  np.where(fwd, uc - out["lead_clip"],
                           uc + out["ref_len"] + out["tail_clip"] - 1))
    np.testing.assert_array_equal(p5, recs.prime5)


def test_bgzf_parallel_roundtrip():
    """Native pthread BGZF == Python BGZF semantics; decompresses back."""
    from fgdp_tpu.io import bgzf, native
    if native.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(9)
    data = rng.integers(0, 255, 1_000_000, dtype=np.uint8).tobytes() + \
        b"tail" * 1000
    res = native.bgzf_compress(data, level=6, threads=4)
    assert res is not None
    comp, table = res
    assert bgzf.decompress(comp) == data
    # block table matches the serial layout semantics
    _, ptable = bgzf.compress_stream(data, 6, threads=1)
    assert [t[0] for t in table] == [t[0] for t in ptable]
    assert [t[2] for t in table] == [t[2] for t in ptable]
    # virtual offsets resolve identically by uncompressed position
    vm = bgzf.VirtualOffsetMap(table)
    v = vm.voffset(700_000)
    blk = 700_000 // 0xFF00
    assert v == (table[blk][1] << 16 | (700_000 - blk * 0xFF00))


def test_ksw_global_native_parity(rng):
    """Native banded-global DP (ksw_global_batch_native) is bit-identical
    to the Python scalar transcription over random indel/mismatch jobs."""
    from fgdp_tpu.align import finalize
    from fgdp_tpu.io import native

    mat = np.full((5, 5), -4, np.int32)
    np.fill_diagonal(mat, 1)
    mat[4, :] = -1
    mat[:, 4] = -1
    N = 60
    QM = TM = 180
    qs = np.zeros((N, QM), np.uint8)
    ts = np.zeros((N, TM), np.uint8)
    qlens = np.zeros(N, np.int32)
    tlens = np.zeros(N, np.int32)
    ws = np.zeros(N, np.int32)
    for j in range(N):
        tl = int(rng.integers(20, TM))
        t = rng.integers(0, 4, tl).astype(np.uint8)
        # query = target with mutations/indels
        q = list(t)
        for _ in range(int(rng.integers(0, 8))):
            k = int(rng.integers(0, len(q)))
            r = rng.random()
            if r < 0.5:
                q[k] = int(rng.integers(0, 5))
            elif r < 0.75 and len(q) > 21:
                del q[k]
            else:
                q.insert(k, int(rng.integers(0, 4)))
        q = np.asarray(q[:QM], np.uint8)
        qs[j, :len(q)] = q
        ts[j, :tl] = t
        qlens[j] = len(q)
        tlens[j] = tl
        ws[j] = int(rng.integers(3, 40))
    res = native.ksw_global_batch(qs, qlens, ts, tlens, ws,
                                  6, 1, 6, 1, mat)
    assert res is not None, "native library must build in CI"
    scores, cigars = res
    for j in range(N):
        sc, cg = finalize.ksw_global(qs[j, :qlens[j]], ts[j, :tlens[j]],
                                     6, 1, 6, 1, int(ws[j]), mat)
        assert int(scores[j]) == sc, j
        assert cigars[j] == cg, j
