"""Sequence-parallel streaming ops: overlap-save FIR + PFB over halos.

Each op runs time-sharded on the 8-device virtual mesh and must be
bit-level-close to its unsharded streaming form, including carried
state across consecutive chunks (the config-4 wideband path).
"""

import numpy as np
import pytest
from scipy import signal as sig

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from radiocore_tpu.ops.fir import fir_overlap_save, fir_stream
from radiocore_tpu.ops.pfb import pfb_taps, pfb_init, pfb_channelize
from radiocore_tpu.parallel.mesh import make_radio_mesh, TIME
from radiocore_tpu.parallel.halo import (fir_overlap_save_halo,
                                         pfb_channelize_halo)


@pytest.fixture(scope="module")
def mesh():
    return make_radio_mesh(stations=1, time=8)


def _iq(n, seed):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) + 1j * rng.standard_normal(n)) \
        .astype(np.complex64)


def test_fir_overlap_save_sharded_matches_streaming(mesh):
    taps = sig.firwin(129, 0.4)
    n = 8 * 8192
    chunks = [_iq(n, s) for s in (0, 1)]

    fn = jax.jit(jax.shard_map(
        lambda x, h: fir_overlap_save_halo(x, taps, TIME, stream_history=h),
        mesh=mesh, in_specs=(P(TIME), P()), out_specs=(P(TIME), P())))

    hist = jnp.zeros(128, jnp.complex64)
    ref_hist = jnp.zeros(128, jnp.complex64)
    for chunk in chunks:
        y, hist = fn(jnp.asarray(chunk), hist)
        ref = fir_overlap_save(jnp.asarray(chunk), taps, history=ref_hist)
        _, ref_hist = fir_stream(jnp.asarray(chunk),
                                 taps.astype(np.float32), ref_hist)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=0, atol=2e-5)
    # Carried state must equal the chunk tail.
    np.testing.assert_allclose(np.asarray(hist), chunks[-1][-128:],
                               atol=1e-7)


def test_pfb_sharded_matches_streaming(mesh):
    m, p = 16, 8
    taps = pfb_taps(m, p)
    n = 8 * 4096
    chunks = [_iq(n, s) for s in (3, 4)]

    fn = jax.jit(jax.shard_map(
        lambda x, h: pfb_channelize_halo(x, taps, m, TIME,
                                         stream_history=h),
        mesh=mesh, in_specs=(P(TIME), P()), out_specs=(P(TIME, None), P())))

    hist = pfb_init(m, p)
    ref_hist = pfb_init(m, p)
    for chunk in chunks:
        ch, hist = fn(jnp.asarray(chunk), hist)
        ref, ref_hist = pfb_channelize(jnp.asarray(chunk), taps, m,
                                       history=ref_hist)
        assert ch.shape == (n // m, m)
        np.testing.assert_allclose(np.asarray(ch), np.asarray(ref),
                                   rtol=0, atol=2e-6)
    np.testing.assert_allclose(np.asarray(hist),
                               chunks[-1][-(p - 1) * m:], atol=1e-7)
