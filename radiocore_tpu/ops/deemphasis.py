"""Streaming FM de-emphasis as a stateful FIR.

The reference converts the single-pole IIR to a 51-tap FIR ("improves
processing time on the GPU") and runs ``lfilter`` with carried state
across 1-second chunks (reference: ``radiocore/analog/deemphasis.py:40-49,64``).
Here the state is the raw trailing input history — an explicit pytree
threaded through a pure jitted step, vmap-able over stations.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp

from radiocore_tpu.ops import design
from radiocore_tpu.ops.fir import fir_stream


def deemphasis_init(input_size: int, rate: float = 75e-6,
                    num_taps: int = 51,
                    batch_shape: Tuple[int, ...] = (),
                    dtype=jnp.float32) -> Tuple[np.ndarray, jnp.ndarray]:
    """Design taps and the initial carried state.

    The initial history is all-ones — the steady state the reference seeds
    via ``lfilter_zi`` (reference: ``radiocore/analog/deemphasis.py:48-49``),
    i.e. the filter behaves as if the input had been 1.0 forever.
    """
    taps = design.deemphasis_taps(input_size, rate, num_taps)
    hist = jnp.ones(batch_shape + (num_taps - 1,), dtype=dtype)
    return taps, hist


def deemphasis_apply(x: jnp.ndarray, taps,
                     history: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply de-emphasis to one chunk; returns ``(audio, new_history)``."""
    return fir_stream(x, taps, history)
