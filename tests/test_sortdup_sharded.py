"""Contig-range-sharded markdup/sort vs the single-device kernels on a
virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fgdp_tpu.parallel import sortdup_sharded as shd
from fgdp_tpu.sortdup import engine

N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < N_DEV:
        pytest.skip("needs 8 virtual devices")
    from jax.sharding import Mesh
    return Mesh(np.asarray(jax.devices()[:N_DEV]), ("sp",))


def _mk_args(rng, nd=256, ns=128, ref_len=1 << 34):
    hi, lo = engine.split64(
        rng.integers(0, ref_len, nd).astype(np.int64))
    # force some exact key collisions (duplicates)
    def dup_some(a):
        a = np.asarray(a).copy()
        a[1::7] = a[0::7][: len(a[1::7])]
        return a
    p5a = dup_some(rng.integers(0, ref_len // 2, nd).astype(np.int64))
    p5b = p5a + rng.integers(50, 500, nd)
    orient = dup_some(rng.integers(0, 4, nd).astype(np.int64))
    p5a_hi, p5a_lo = engine.split64(jnp.asarray(p5a))
    p5b_hi, p5b_lo = engine.split64(jnp.asarray(p5b))
    s_p5 = dup_some(rng.integers(0, ref_len // 2, ns).astype(np.int64))
    # some singles colliding with double ends (indicator hits)
    s_p5[:8] = p5a[:8]
    s_rev = np.zeros(ns, np.int64)
    s_rev[::2] = 3
    s_rev[:8] = np.where(orient[:8] >= 2, 3, 0)     # match left-end strand
    sp_hi, sp_lo = engine.split64(jnp.asarray(s_p5))
    rl_hi, rl_lo = engine.split64(jnp.asarray(np.int64(ref_len)))
    i32 = lambda n, hi_: jnp.asarray(rng.integers(0, hi_, n), jnp.int32)
    args = dict(
        dbl_p5a_hi=p5a_hi, dbl_p5a_lo=p5a_lo,
        dbl_orient=jnp.asarray(orient, jnp.int32),
        dbl_p5b_hi=p5b_hi, dbl_p5b_lo=p5b_lo,
        dbl_score=i32(nd, 1000), dbl_tile=i32(nd, 100),
        dbl_x=i32(nd, 10000), dbl_y=i32(nd, 10000),
        dbl_valid=jnp.asarray(rng.random(nd) < 0.95),
        sgl_p5_hi=sp_hi, sgl_p5_lo=sp_lo,
        sgl_rev=jnp.asarray(s_rev, jnp.int32),
        sgl_score=i32(ns, 1000), sgl_tile=i32(ns, 100),
        sgl_x=i32(ns, 10000), sgl_y=i32(ns, 10000),
        sgl_valid=jnp.asarray(rng.random(ns) < 0.95),
        ref_len_hi=rl_hi, ref_len_lo=rl_lo,
    )
    return args, ref_len


def test_sharded_markdup_matches_single_device(mesh):
    rng = np.random.default_rng(42)
    args, ref_len = _mk_args(rng)
    ref_dbl, ref_sgl = engine.mark_duplicates(**args)
    got_dbl, got_sgl, ovf = shd.sharded_mark_duplicates(
        mesh, args, *engine.split64(jnp.asarray(np.int64(2 * ref_len))))
    assert not ovf
    assert np.array_equal(np.asarray(got_dbl), np.asarray(ref_dbl))
    assert np.array_equal(np.asarray(got_sgl), np.asarray(ref_sgl))


def test_sharded_markdup_overflow_flag(mesh):
    rng = np.random.default_rng(1)
    args, ref_len = _mk_args(rng)
    # all doubles in one tiny range -> one shard; tiny capacity overflows
    nd = args["dbl_p5a_hi"].shape[0]
    args["dbl_p5a_hi"] = jnp.zeros(nd, jnp.int32)
    args["dbl_p5a_lo"] = jnp.asarray(
        rng.integers(0, 100, nd), jnp.int32)
    _, _, ovf = shd.sharded_mark_duplicates(
        mesh, args, *engine.split64(jnp.asarray(np.int64(2 * ref_len))),
        per_dest_cap=4)
    assert ovf


def test_sharded_sort_matches_single_device(mesh):
    rng = np.random.default_rng(7)
    n = 512
    total = np.int64(1 << 40)
    uc = rng.integers(0, total, n).astype(np.int64)
    uc[5] = uc[10]                         # ties
    valid = rng.random(n) < 0.9
    hi, lo = engine.split64(jnp.asarray(uc))
    ref_order = np.asarray(engine.coordinate_sort_order(
        hi, lo, jnp.asarray(valid)))[: valid.sum()]
    got, ovf = shd.sharded_coordinate_sort(
        mesh, hi, lo, jnp.asarray(valid), *engine.split64(total))
    assert not ovf
    # both orders sort by (coord, original index): identical
    assert np.array_equal(got, ref_order)
