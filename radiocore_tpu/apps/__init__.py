"""Application layer: receiver apps and IQ sources/sinks.

Parity targets (reference ``examples/``): ``receive_fm`` (single
station), ``multi_fm_server`` (channelize + demod + ZMQ PUB),
``multi_fm_receiver`` (ZMQ SUB + audio out). Hardware edges are
pluggable: SoapySDR and sounddevice are optional (absent in CI);
synthetic and file IQ sources plus WAV sinks make every app runnable
headless.
"""

from radiocore_tpu.apps.iq import (SyntheticFmSource, IQFileSource,
                                   SoapySdrSource, AudioDeviceSink,
                                   WavSink, write_iq_file)

__all__ = ["SyntheticFmSource", "IQFileSource", "SoapySdrSource",
           "AudioDeviceSink", "WavSink", "write_iq_file"]
