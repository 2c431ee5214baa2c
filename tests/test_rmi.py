"""Learned-index (RMI) lookup + chunked exact search vs brute force."""

import numpy as np
import pytest

import jax.numpy as jnp

from fgdp_tpu.index.fmindex import FMIndex
from fgdp_tpu.index.rmi import RMIndex, pack_pattern
from fgdp_tpu.ops.exact import DeviceRMI, exact_search, pack_patterns, \
    rmi_interval
from fgdp_tpu.ops.fm import DeviceFMIndex
from fgdp_tpu.utils import dna

K = 13


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(17)
    ref = rng.integers(0, 4, 1500).astype(np.uint8)
    fm = FMIndex.build(ref)
    x = np.concatenate([ref, dna.revcomp(ref)]).astype(np.uint8)
    rmi = RMIndex.build(x, fm.sa, leaf_bits=8)
    return rng, ref, x, fm, rmi


def test_keys_sorted_and_lookup_host(world):
    rng, ref, x, fm, rmi = world
    assert np.all(np.diff(rmi.keys.astype(np.int64)) >= 0)
    for _ in range(50):
        p = int(rng.integers(0, len(x) - K))
        pat = x[p:p + K]
        lo, s = rmi.lookup_host(pack_pattern(pat))
        # brute force occurrences of pat in x
        occ = sorted(i for i in range(len(x) - K + 1)
                     if np.array_equal(x[i:i + K], pat))
        got = sorted(int(fm.sa[r]) for r in range(lo, lo + s))
        assert got == occ


def test_device_interval_matches_host(world):
    rng, ref, x, fm, rmi = world
    drmi = DeviceRMI.from_host(rmi)
    pos = rng.integers(0, len(x) - K, 64)
    pats = np.stack([x[p:p + K] for p in pos]).astype(np.int32)
    # some absent/random patterns too
    pats[::5] = rng.integers(0, 4, (len(pats[::5]), K))
    qk, ok = pack_patterns(jnp.asarray(pats), jnp.zeros(len(pats),
                                                        jnp.int32), K)
    k_d, s_d = rmi_interval(drmi, qk)
    for i in range(len(pats)):
        lo, s = rmi.lookup_host(pack_pattern(pats[i]))
        assert int(s_d[i]) == s and (s == 0 or int(k_d[i]) == lo), i


def test_exact_search_full_patterns(world):
    rng, ref, x, fm, rmi = world
    dfm = DeviceFMIndex.from_host(fm)
    drmi = DeviceRMI.from_host(rmi)
    B, L = 32, 41
    reads = np.zeros((B, L), np.int32)
    lens = np.full(B, L, np.int32)
    for i in range(B):
        kind = i % 4
        if kind == 0:                      # planted, full length
            p = int(rng.integers(0, len(x) - L))
            reads[i] = x[p:p + L]
        elif kind == 1:                    # mutated -> usually absent
            p = int(rng.integers(0, len(x) - L))
            r = x[p:p + L].copy()
            r[L // 2] = (r[L // 2] + 1) % 4
            reads[i] = r
        elif kind == 2:                    # short (< RMI chunk)
            p = int(rng.integers(0, len(x) - L))
            reads[i] = x[p:p + L]
            lens[i] = int(rng.integers(4, K))
        else:                              # with an ambiguous base
            p = int(rng.integers(0, len(x) - L))
            reads[i] = x[p:p + L]
            reads[i, int(rng.integers(0, L))] = 4
    k_d, s_d = exact_search(dfm, drmi, jnp.asarray(reads),
                            jnp.asarray(lens))
    for i in range(B):
        pat = reads[i, :lens[i]]
        if np.any(pat >= 4):
            occ = []
        else:
            m = len(pat)
            occ = sorted(j for j in range(len(x) - m + 1)
                         if np.array_equal(x[j:j + m], pat))
        got = sorted(int(fm.sa[r])
                     for r in range(int(k_d[i]), int(k_d[i]) + int(s_d[i])))
        assert got == occ, i


def test_save_load_roundtrip(tmp_path, world):
    _, _, x, fm, rmi = world
    path = tmp_path / "t.rmi"
    rmi.save(str(path))
    r2 = RMIndex.load(str(path))
    assert np.array_equal(r2.keys, rmi.keys)
    assert np.array_equal(r2.starts, rmi.starts)
    assert r2.shift == rmi.shift and r2.k == rmi.k
    qk = pack_pattern(x[100:100 + K])
    assert r2.lookup_host(qk) == rmi.lookup_host(qk)


def test_inexact_search_one_mismatch(world):
    """Brute-force oracle: occurrence POSITIONS of all patterns within
    hamming distance z of the query."""
    from fgdp_tpu.ops.exact import inexact_search

    rng, ref, x, fm, rmi = world
    dfm = DeviceFMIndex.from_host(fm)
    B, L = 16, 17
    reads = np.zeros((B, L), np.int32)
    for i in range(B):
        p = int(rng.integers(0, len(x) - L))
        r = x[p:p + L].copy()
        if i % 2:
            r[int(rng.integers(0, L))] = (r[int(rng.integers(0, L))] + 1) % 4
        reads[i] = r
    lens = np.full(B, L, np.int32)
    ks, ss, cnt, ovf = inexact_search(dfm, jnp.asarray(reads),
                                      jnp.asarray(lens), z=1, max_out=64)
    assert not bool(np.asarray(ovf).any())
    for b in range(B):
        got = set()
        for j in range(int(cnt[b])):
            for r in range(int(ks[b, j]), int(ks[b, j]) + int(ss[b, j])):
                got.add(int(fm.sa[r]))
        pat = reads[b]
        want = {p for p in range(len(x) - L + 1)
                if np.sum(x[p:p + L] != pat) <= 1}
        assert got == want, b


def test_device_interval_max_key_no_overshoot(world):
    """Lexicographically maximal keys: the q+1 probe must converge to N
    exactly (a fixed-iteration bisection without a lo<hi guard drifts
    to N+1 and reports s one too large)."""
    rng, ref, x, fm, rmi = world
    drmi = DeviceRMI.from_host(rmi)
    qmax = int(rmi.keys[-1])
    k_d, s_d = rmi_interval(drmi, jnp.asarray([qmax, qmax], jnp.int32))
    lo, s = rmi.lookup_host(qmax)
    assert int(s_d[0]) == s and int(k_d[0]) == lo
