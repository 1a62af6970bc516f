"""Device mesh construction for the radio pipeline."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

STATIONS = "stations"
TIME = "time"


def make_radio_mesh(stations: int = 0, time: int = 1,
                    devices: Optional[Sequence] = None) -> Mesh:
    """Build a ``(stations, time)`` mesh.

    ``stations=0`` auto-sizes the station axis to use all devices given
    the time axis. Station parallelism is the cheap axis (no collectives
    in steady state) so it gets the remaining devices by default.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if stations <= 0:
        if n % time != 0:
            raise ValueError(f"{n} devices not divisible by time={time}")
        stations = n // time
    if stations * time != n:
        raise ValueError(
            f"mesh {stations}x{time} != {n} available devices")
    arr = np.asarray(devices).reshape(stations, time)
    return Mesh(arr, (STATIONS, TIME))


def station_sharding(mesh: Mesh, rank: int = 2) -> NamedSharding:
    """Sharding that splits the leading (station) axis only."""
    spec = P(STATIONS, *([None] * (rank - 1)))
    return NamedSharding(mesh, spec)
