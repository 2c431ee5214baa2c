"""Flat reg wire format (pipeline.pack_regs/unpack_regs).

The device->host link charges ~28 ms of fixed cost per fetched array
plus bandwidth (measured round 5), so AlnRegBatch ships as ONE flat
int32 buffer holding only the VALID reg slots. Unpack normalizes each
read's regs into a valid-first prefix; the test therefore compares the
per-read ordered lists of valid entries (the only thing downstream
consumes, pipeline._reg_lists_np), plus flags and cap-overflow
semantics."""

import numpy as np
import pytest

import jax.numpy as jnp

from fgdp_tpu.align.extend import AlnRegBatch
from fgdp_tpu.pipeline import pack_regs, unpack_regs

FIELDS = ("rid", "qb", "qe", "rb", "re", "score", "truesc", "sw_w",
          "seedcov", "seedlen0")


def mk_regs(rng, B, E, valid_frac=0.2):
    mk16 = lambda lo, hi: rng.integers(lo, hi, (B, E)).astype(np.int16)
    return AlnRegBatch(
        rid=rng.integers(-1, 3, (B, E)).astype(np.int32),
        qb=mk16(0, 151), qe=mk16(0, 152),
        rb=rng.integers(0, 2**31 - 200, (B, E)).astype(np.int32),
        re=rng.integers(0, 2**31 - 1, (B, E)).astype(np.int32),
        score=mk16(-1, 302), truesc=mk16(-30000, 30000),
        sw_w=mk16(0, 400), seedcov=mk16(0, 152), seedlen0=mk16(0, 152),
        frac_rep=rng.random(B).astype(np.float32),
        valid=rng.random((B, E)) < valid_frac,
        overflow=rng.random(B) < 0.2,
        ovf_seed=rng.random(B) < 0.1,
    )


def rows_of(d, b):
    return [tuple(int(d[f][b][e]) for f in FIELDS)
            for e in np.flatnonzero(d["valid"][b])]


@pytest.mark.parametrize("E", [16, 7, 33])
def test_pack_unpack_roundtrip(E):
    rng = np.random.default_rng(3)
    B = 37
    # keep total valid under CAP = 4*B so nothing truncates
    regs = mk_regs(rng, B, E, valid_frac=min(0.2, 3.5 / E))
    out = unpack_regs(np.asarray(pack_regs(
        AlnRegBatch(*(jnp.asarray(v) for v in regs)))))
    want = regs._asdict()
    np.testing.assert_array_equal(out["overflow"], want["overflow"])
    np.testing.assert_array_equal(out["ovf_seed"], want["ovf_seed"])
    np.testing.assert_array_equal(out["frac_rep"], want["frac_rep"])
    for b in range(B):
        assert rows_of(out, b) == rows_of(
            {k: np.asarray(v) for k, v in want.items()}, b), b


def test_pack_cap_overflow():
    """Slots past CAP drop with the read's overflow flag set; earlier
    reads are untouched."""
    rng = np.random.default_rng(5)
    B, E = 16, 8
    regs = mk_regs(rng, B, E, valid_frac=1.0)  # 8 valid/read, CAP=4B=64
    regs = regs._replace(overflow=np.zeros(B, bool))
    out = unpack_regs(np.asarray(pack_regs(
        AlnRegBatch(*(jnp.asarray(v) for v in regs)))))
    counts = out["valid"].sum(axis=1)
    assert counts.sum() == 4 * B
    full = np.flatnonzero(counts == E)
    want = regs._asdict()
    for b in full:
        assert not out["overflow"][b]
        assert rows_of(out, b) == rows_of(
            {k: np.asarray(v) for k, v in want.items()}, b)
    assert out["overflow"][counts < E].all()
