"""WBFM stereo broadcast-FM demodulator — the flagship model.

Pipeline (matching reference ``radiocore/analog/wbfm.py:66-105``):

1. quadrature demod at full rate, spectrally windowed (the reference's
   internal ``FM(input_size, input_size)`` still applies the hamming
   spectral window through its no-op-size resample,
   reference: ``wbfm.py:42-43`` + ``fm.py:66``);
2. 19 kHz pilot extraction: 41-tap zero-phase bandpass
   (reference: ``wbfm.py:45-46``);
3. 38 kHz subcarrier regeneration: analytic-signal squared
   (reference: ``wbfm.py:80-83``, empirical stereo gain 1.0175);
4. stereo matrix L = comp + (L−R), R = comp − (L−R), FFT-decimated to the
   audio rate (decimation doubles as the 15 kHz lowpass,
   reference: ``wbfm.py:86-87``);
5. per-channel streaming de-emphasis (reference: ``wbfm.py:90-91``);
6. stack, remove global DC, clip ±0.999 (reference: ``wbfm.py:94-100``).

TPU-first design: the whole pipeline is one pure function of
``(iq_chunk, state)`` with static shapes — one XLA program, freely
vmap-able over a station axis. Output shape is ``(output_size, 2)``
(the reference returns numpy ``dstack`` shape ``(1, output_size, 2)``;
bytes are identical when serialized — conscious cleanup, SURVEY.md §7.4).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp

from radiocore_tpu.runtime.transfer import to_device_c64

from radiocore_tpu.ops import design
from radiocore_tpu.ops.resample import resample_fft
from radiocore_tpu.ops.fir import zero_phase_fir
from radiocore_tpu.ops.demod import quadrature_demod
from radiocore_tpu.ops.analytic import analytic_signal, pll_harmonic
from radiocore_tpu.ops.deemphasis import deemphasis_init, deemphasis_apply

State = Dict[str, jnp.ndarray]

STEREO_GAIN = 1.0175   # empirical L−R gain (reference: wbfm.py:83)
CLIP = 0.999
PILOT_TAPS = 41        # (reference: wbfm.py:45-46)
PILOT_LO = 19e3 - 50
PILOT_HI = 19e3 + 50


def wbfm_init_state(output_size: int, rate: float = 75e-6,
                    batch_shape: Tuple[int, ...] = ()) -> State:
    """Initial de-emphasis state pytree (per station when batched)."""
    _, hist = deemphasis_init(output_size, rate, batch_shape=batch_shape)
    return {"deemph_l": hist, "deemph_r": hist}


def make_wbfm_step(input_size: int, output_size: int,
                   deemphasis: float = 75e-6
                   ) -> Callable[[jnp.ndarray, State], Tuple[jnp.ndarray, State]]:
    """Build the pure WBFM step function for static chunk sizes.

    Returned step maps ``(iq (..., input_size) c64, state) →
    (audio (..., output_size, 2) f32, state)``; leading batch dims are the
    station axis.
    """
    input_size, output_size = int(input_size), int(output_size)
    win = design.resample_window("hamm", input_size)
    bp_taps = design.bandpass_taps(PILOT_TAPS, PILOT_LO, PILOT_HI, input_size)
    de_taps, _ = deemphasis_init(output_size, deemphasis)

    def step(iq: jnp.ndarray, state: State) -> Tuple[jnp.ndarray, State]:
        comp = quadrature_demod(iq)
        comp = resample_fft(comp, input_size, win)  # spectral hamming lowpass

        pilot = zero_phase_fir(comp, bp_taps)
        subcarrier = pll_harmonic(analytic_signal(pilot), 2, "imag")
        lmr = subcarrier * comp * STEREO_GAIN

        left = resample_fft(comp + lmr, output_size, win)
        right = resample_fft(comp - lmr, output_size, win)

        left, hist_l = deemphasis_apply(left, de_taps, state["deemph_l"])
        right, hist_r = deemphasis_apply(right, de_taps, state["deemph_r"])

        audio = jnp.stack([left, right], axis=-1)
        audio = audio - jnp.mean(audio, axis=(-2, -1), keepdims=True)
        audio = jnp.clip(audio, -CLIP, CLIP)
        return audio.astype(jnp.float32), {"deemph_l": hist_l,
                                           "deemph_r": hist_r}

    return step


class WBFM:
    """Stateful WBFM wrapper with the reference's ``run`` API.

    Parity surface: ``run(input_sig, numpy_output=True)`` and
    ``channels == 2`` (reference: ``radiocore/analog/wbfm.py:61-105``).
    """

    def __init__(self, input_size: Union[int, float],
                 output_size: Union[int, float],
                 deemphasis: float = 75e-6, cuda: bool = False):
        # ``cuda`` accepted for signature parity; dispatch is XLA's job.
        del cuda
        self._input_size = int(input_size)
        self._output_size = int(output_size)
        self._step = jax.jit(
            make_wbfm_step(self._input_size, self._output_size, deemphasis))
        self._state = wbfm_init_state(self._output_size, deemphasis)

    @property
    def channels(self) -> int:
        return 2

    def run(self, input_sig, numpy_output: bool = True):
        if len(input_sig) != self._input_size:
            raise ValueError("input_sig size and input_size mismatch")
        iq = to_device_c64(input_sig)
        audio, self._state = self._step(iq, self._state)
        return np.asarray(audio) if numpy_output else audio
