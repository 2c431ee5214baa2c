"""FM-index build + host-side bi-directional extension vs brute force."""

import numpy as np
import pytest

from fgdp_tpu.index.fmindex import FMIndex
from fgdp_tpu.index.suffix_array import suffix_array
from fgdp_tpu.testing import oracles
from fgdp_tpu.utils import dna


def random_ref(rng, n):
    return rng.integers(0, 4, size=n, dtype=np.uint8)


def test_suffix_array_matches_sorted_suffixes(rng):
    codes = random_ref(rng, 300)
    sa = suffix_array(codes)
    suffixes = sorted(range(len(codes)), key=lambda i: codes[i:].tobytes())
    assert list(sa) == suffixes


def test_suffix_array_repetitive():
    codes = np.array([0, 1, 0, 1, 0, 1, 0], dtype=np.uint8)  # ACACACA
    sa = suffix_array(codes)
    suffixes = sorted(range(len(codes)), key=lambda i: codes[i:].tobytes())
    assert list(sa) == suffixes


@pytest.mark.parametrize("n", [64, 257, 1000])
def test_interval_sizes_match_occurrence_counts(rng, n):
    ref = random_ref(rng, n)
    fm = FMIndex.build(ref)
    text = oracles.text_with_rc(ref)
    for _ in range(40):
        plen = int(rng.integers(1, 12))
        start = int(rng.integers(0, 2 * n - plen))
        pat = np.frombuffer(text[start:start + plen], dtype=np.uint8)
        # backward search
        k, l, s = fm.init_interval(int(pat[-1]))
        for c in pat[-2::-1]:
            k, l, s = fm.backward_extend(k, l, s, int(c))
            if s == 0:
                break
        assert s == oracles.count_occ(text, pat.tobytes())
        if s > 0:
            hits = sorted(int(fm.sa[k + i]) for i in range(s))
            assert hits == oracles.find_all(text, pat.tobytes())


def test_forward_extension_matches_backward(rng):
    ref = random_ref(rng, 400)
    fm = FMIndex.build(ref)
    text = oracles.text_with_rc(ref)
    for _ in range(25):
        plen = int(rng.integers(2, 10))
        start = int(rng.integers(0, 2 * 400 - plen))
        pat = np.frombuffer(text[start:start + plen], dtype=np.uint8)
        # forward search (left to right)
        k, l, s = fm.init_interval(int(pat[0]))
        for c in pat[1:]:
            k, l, s = fm.forward_extend(k, l, s, int(c))
            if s == 0:
                break
        assert s == oracles.count_occ(text, pat.tobytes())
        # the l-interval must locate the reverse complement
        rc = dna.revcomp(pat)
        if s > 0:
            hits = sorted(int(fm.sa[l + i]) for i in range(s))
            assert hits == oracles.find_all(text, rc.tobytes())


def test_occ_sentinel_correction(rng):
    ref = random_ref(rng, 50)
    fm = FMIndex.build(ref)
    # total occ at end of BWT must equal symbol counts of X
    x = np.concatenate([ref, dna.revcomp(ref)])
    for c in range(4):
        assert fm.occ_at(c, fm.text_len) == int((x == c).sum())


def test_save_load_roundtrip(tmp_path, rng):
    ref = random_ref(rng, 128)
    fm = FMIndex.build(ref)
    fm.save(tmp_path / "idx")
    fm2 = FMIndex.load(tmp_path / "idx.npz")
    assert fm2.n_ref == fm.n_ref
    np.testing.assert_array_equal(fm2.sa, fm.sa)
    np.testing.assert_array_equal(fm2.occ, fm.occ)
    np.testing.assert_array_equal(fm2.bwt_words, fm.bwt_words)


def test_two_step_extension_matches_sequential(rng):
    """backward_extend2 / forward_extend2 (the fork's lbwt 2-step kernels,
    src/bwt.cpp:278-1065) == two sequential 1-step extensions, host and
    device."""
    import jax.numpy as jnp
    from fgdp_tpu.ops import fm as fmops

    ref = random_ref(rng, 600)
    fm = FMIndex.build(ref)
    dfm = fmops.DeviceFMIndex.from_host(fm)

    ks, ls, ss, cas, cbs = [], [], [], [], []
    want_b, want_f = [], []
    for _ in range(200):
        p0 = int(rng.integers(0, len(ref) - 6))
        pat = ref[p0:p0 + int(rng.integers(1, 5))]
        k, l, s = fm.init_interval(int(pat[-1]))
        for c in pat[-2::-1]:
            k, l, s = fm.backward_extend(k, l, s, int(c))
            if s == 0:
                break
        if s == 0:
            continue
        ca, cb = int(rng.integers(0, 4)), int(rng.integers(0, 4))
        # backward: prepend cb then ca
        ka, la, sa_ = fm.backward_extend(k, l, s, cb)
        sb = 0
        kb = -1
        if sa_ > 0:
            kb, _, sb = fm.backward_extend(ka, la, sa_, ca)
        assert fm.backward_extend2(k, s, ca, cb)[1] == sb
        # forward: append ca then cb
        (i1), (i2) = fm.forward_extend2(k, l, s, ca, cb)
        kf, lf, sf = fm.forward_extend(k, l, s, ca)
        assert i1 == (kf, lf, sf)
        if sf > 0:
            assert i2[2] == fm.forward_extend(kf, lf, sf, cb)[2]
        ks.append(k); ls.append(l); ss.append(s); cas.append(ca); cbs.append(cb)
        want_b.append((ka, sa_, kb if sb > 0 else 0, sb))
        want_f.append((i1, i2))

    k = jnp.asarray(ks, jnp.int32)
    l = jnp.asarray(ls, jnp.int32)
    s = jnp.asarray(ss, jnp.int32)
    ca = jnp.asarray(cas, jnp.int32)
    cb = jnp.asarray(cbs, jnp.int32)
    k1, s1, k2, s2 = (np.asarray(v) for v in
                      fmops.backward_extend2(dfm, k, s, cb, ca))
    wb = np.asarray(want_b)
    np.testing.assert_array_equal(k1, wb[:, 0])
    np.testing.assert_array_equal(s1, wb[:, 1])
    np.testing.assert_array_equal(s2, wb[:, 3])
    live = wb[:, 3] > 0
    np.testing.assert_array_equal(k2[live], wb[live, 2])
    (dk1, dl1, ds1), (dk2, dl2, ds2) = fmops.forward_extend2(dfm, k, l, s,
                                                             ca, cb)
    wf1 = np.asarray([w[0] for w in want_f])
    wf2 = np.asarray([w[1] for w in want_f])
    got1 = np.stack([np.asarray(dk1), np.asarray(dl1), np.asarray(ds1)], 1)
    got2 = np.stack([np.asarray(dk2), np.asarray(dl2), np.asarray(ds2)], 1)
    np.testing.assert_array_equal(got1, wf1)
    np.testing.assert_array_equal(got2[:, 2], wf2[:, 2])
    live = wf2[:, 2] > 0
    np.testing.assert_array_equal(got2[live], wf2[live])


def test_fetch_window_matches_elementwise():
    import jax.numpy as jnp
    from fgdp_tpu.index.reference import DeviceReference, PackedReference

    rng = np.random.default_rng(3)
    ref = rng.integers(0, 4, 777).astype(np.uint8)
    dref = DeviceReference(PackedReference.from_contigs(["c"], [ref]))
    T = 48
    start = jnp.asarray(rng.integers(-20, 2 * 777 + 20, 64), jnp.int32)
    tt = jnp.arange(T, dtype=jnp.int32)[None, :]
    want_f = dref.fetch(start[:, None] + tt)
    got_f = dref.fetch_window(start, T)
    assert np.array_equal(np.asarray(got_f), np.asarray(want_f))
    want_r = dref.fetch(start[:, None] + (T - 1) - tt)
    got_r = dref.fetch_window(start, T, reverse=True)
    assert np.array_equal(np.asarray(got_r), np.asarray(want_r))


def test_native_sais_matches_doubling():
    from fgdp_tpu.index import suffix_array as samod
    from fgdp_tpu.io import native

    if native.get_lib() is None:
        import pytest
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(9)
    cases = [rng.integers(0, 4, n).astype(np.uint8)
             for n in (1, 2, 3, 7, 50, 1000, 4096)]
    cases.append(np.zeros(64, np.uint8))                 # all-A runs
    cases.append(np.tile([0, 1], 40).astype(np.uint8))   # period-2
    cases.append(np.tile([2, 2, 1], 33).astype(np.uint8))
    for c in cases:
        want = samod._suffix_array_doubling(c) \
            if hasattr(samod, "_suffix_array_doubling") else None
        got = native.suffix_array_u8(c)
        # independent check: sorted order of suffixes
        n = len(c)
        sfx = sorted(range(n), key=lambda i: tuple(c[i:]))
        assert np.array_equal(got, np.asarray(sfx, np.int64)), len(c)
