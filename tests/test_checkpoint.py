"""Checkpoint/resume: a restored WBFM continues bit-identically."""

import numpy as np

import oracles
from radiocore_tpu import WBFM
from radiocore_tpu.runtime.checkpoint import save_state, load_state
from radiocore_tpu.models.wbfm import wbfm_init_state

FS, AUDIO = 100_000, 20_000


def test_state_roundtrip(tmp_path):
    state = wbfm_init_state(AUDIO, batch_shape=(3,))
    path = str(tmp_path / "state.npz")
    save_state(path, state)
    restored = load_state(path, wbfm_init_state(AUDIO, batch_shape=(3,)))
    for key in state:
        np.testing.assert_array_equal(np.asarray(state[key]),
                                      np.asarray(restored[key]))


def test_resume_continues_stream(tmp_path):
    mpx = oracles.make_stereo_multiplex(FS * 3, FS, 440.0, 1000.0)
    iq = oracles.make_fm_iq(mpx, 0.25).astype(np.complex64).reshape(3, FS)

    # Continuous run: chunks 0, 1, 2.
    ref = WBFM(FS, AUDIO)
    ref.run(iq[0])
    want1 = ref.run(iq[1])
    want2 = ref.run(iq[2])

    # Checkpoint after chunk 0, resume in a fresh instance.
    a = WBFM(FS, AUDIO)
    a.run(iq[0])
    path = str(tmp_path / "wbfm.npz")
    save_state(path, a._state)

    b = WBFM(FS, AUDIO)
    b._state = load_state(path, b._state)
    got1 = b.run(iq[1])
    got2 = b.run(iq[2])
    np.testing.assert_allclose(got1, want1, atol=1e-6)
    np.testing.assert_allclose(got2, want2, atol=1e-6)


def test_load_rejects_shape_mismatch(tmp_path):
    path = str(tmp_path / "s.npz")
    save_state(path, wbfm_init_state(AUDIO))
    try:
        load_state(path, wbfm_init_state(AUDIO, batch_shape=(2,)))
    except ValueError:
        return
    raise AssertionError("expected shape mismatch error")
