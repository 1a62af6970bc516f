"""End-to-end app tests: synthetic source → demod → WAV; ZMQ loopback."""

import os
import threading

import numpy as np
import pytest
from scipy.io import wavfile

import oracles
from radiocore_tpu.apps.iq import (SyntheticFmSource, IQFileSource, WavSink,
                                   write_iq_file)
from radiocore_tpu.apps import receive_fm as rx
from radiocore_tpu.apps import multi_fm_server as srv


def test_synthetic_source_demodulates(tmp_path):
    """SyntheticFmSource → Decimate → WBFM recovers the station's tones."""
    out = tmp_path / "rx.wav"
    cfg = rx.Config(input_rate=200e3, demod_rate=50e3, audio_rate=10e3)
    source = SyntheticFmSource(200_000, [0], 50_000, tones=[(440.0, 880.0)])
    metrics = rx.Metrics()
    with WavSink(str(out), 10_000) as sink:
        rx.run(cfg, source, sink, seconds=2, metrics=metrics)
    rate, audio = wavfile.read(out)
    assert rate == 10_000 and audio.shape == (20_000, 2)
    a = audio.astype(np.float32) / 32767
    assert oracles.tone_snr_db(a[11000:-500, 0], 10_000, 440.0) > 10
    assert oracles.tone_snr_db(a[11000:-500, 1], 10_000, 880.0) > 10


def test_receive_fm_cli(tmp_path, capsys):
    out = tmp_path / "cli.wav"
    rx.main(["--input-rate", "200e3", "--demod-rate", "50e3",
             "--audio-rate", "10e3", "--seconds", "1",
             "--out", str(out)])
    assert os.path.exists(out)
    assert "realtime" in capsys.readouterr().out


def test_iq_file_source_roundtrip(tmp_path):
    path = tmp_path / "capture.cf32"
    iq = (np.arange(1000) + 1j * np.arange(1000)).astype(np.complex64)
    write_iq_file(str(path), iq)
    src = IQFileSource(str(path), 400)
    chunk = src.read_chunk(1.0)
    np.testing.assert_array_equal(chunk, iq[:400])
    chunk2 = src.read_chunk(2.0)  # crosses the loop boundary
    np.testing.assert_array_equal(chunk2[:600], iq[400:])
    np.testing.assert_array_equal(chunk2[600:], iq[:200])


def test_multi_fm_server_headless(tmp_path, capsys):
    prefix = str(tmp_path / "st")
    srv.main(["--stations", "2", "--band-rate", "1e6",
              "--bandwidth", "50e3", "--audio-rate", "10e3",
              "--seconds", "1", "--no-zmq", "--wav-prefix", prefix])
    assert "served 1 chunks" in capsys.readouterr().out
    r0, a0 = wavfile.read(prefix + "_0.wav")
    assert r0 == 10_000 and a0.shape[0] == 10_000
    # Station 0 is WBFM; its left tone (300 Hz) must come through the
    # Tuner → demodulator-class path.
    a = a0.astype(np.float32) / 32767
    assert oracles.tone_snr_db(a[2000:, 0], 10_000, 300.0) > 6


def test_multi_fm_server_fused(tmp_path, capsys):
    prefix = str(tmp_path / "fu")
    srv.main(["--stations", "2", "--band-rate", "1e6",
              "--bandwidth", "50e3", "--audio-rate", "10e3",
              "--seconds", "1", "--no-zmq", "--fused",
              "--wav-prefix", prefix])
    assert "served 1 chunks" in capsys.readouterr().out
    r0, a0 = wavfile.read(prefix + "_0.wav")
    assert r0 == 10_000 and a0.shape == (10_000, 2)  # stereo WBFM
    a = a0.astype(np.float32) / 32767
    # Station 0's left tone (300 Hz per SyntheticFmSource defaults).
    assert oracles.tone_snr_db(a[2000:, 0], 10_000, 300.0) > 6


def test_zmq_pub_sub_loopback(tmp_path):
    zmq = pytest.importorskip("zmq")
    from radiocore_tpu.apps import multi_fm_receiver as rcv

    port = 15591
    specs = [srv.StationSpec(96.9e6, "wbfm", 50e3)]
    tuner = srv.build_tuner(specs, 10e3, request_bandwidth=500e3)
    n_band = int(tuner.input_bandwidth)
    source = SyntheticFmSource(n_band, [0], 50_000, tones=[(440.0, 880.0)])

    ctx = zmq.Context()
    pub = ctx.socket(zmq.PUB)
    pub.bind(f"tcp://*:{port}")

    out = tmp_path / "sub.wav"
    sink = WavSink(str(out), 10_000)
    result = {}

    def client():
        result["got"] = rcv.receive(96.9e6, f"tcp://localhost:{port}",
                                    seconds=2, channels=2,
                                    audio_rate=10_000, sink=sink)

    thread = threading.Thread(target=client)
    thread.start()
    import time
    time.sleep(0.5)  # let SUB connect (PUB drops pre-connect messages)
    try:
        srv.serve(tuner, source, seconds=2, publisher=pub)
    finally:
        pub.close()
    thread.join(timeout=10)
    sink.close()
    assert result["got"] == 2
    rate, audio = wavfile.read(out)
    assert rate == 10_000 and audio.shape == (20_000, 2)


class TestIqFormats:
    """Native C++ IQ converter (native/iqconvert.cpp) vs NumPy math."""

    def test_convert_matches_numpy(self):
        from radiocore_tpu.apps.iq import convert_iq
        rng = np.random.default_rng(7)
        cases = [
            ("cu8", rng.integers(0, 256, 4096).astype(np.uint8),
             lambda r: (r.astype(np.float32) - 127.5) / 127.5),
            ("cs8", rng.integers(-128, 128, 4096).astype(np.int8),
             lambda r: r.astype(np.float32) / 128.0),
            ("cs16", rng.integers(-32768, 32768, 4096).astype(np.int16),
             lambda r: r.astype(np.float32) / 32768.0),
        ]
        for fmt, raw, oracle in cases:
            got = convert_iq(raw, fmt)
            want = oracle(raw).view(np.complex64)
            assert got.dtype == np.complex64
            # 1 ULP: the native kernel multiplies by the reciprocal.
            np.testing.assert_allclose(got.view(np.float32),
                                       want.view(np.float32),
                                       rtol=1.2e-7, atol=0, err_msg=fmt)

    def test_native_path_is_used_when_available(self):
        from radiocore_tpu.native.build import (iq_convert_native,
                                                iq_native_available)
        if not iq_native_available():
            pytest.skip("no C++ toolchain")
        raw = np.arange(0, 256, dtype=np.uint8)
        f32 = iq_convert_native(raw, "cu8")
        np.testing.assert_allclose(
            f32, (raw.astype(np.float32) - 127.5) / 127.5,
            rtol=1.2e-7, atol=0)

    def test_file_source_fixed_point(self, tmp_path):
        from radiocore_tpu.apps.iq import IQFileSource
        rng = np.random.default_rng(3)
        wire = rng.integers(-32768, 32768, 800).astype(np.int16)
        path = tmp_path / "capture.cs16"
        wire.tofile(path)
        src = IQFileSource(str(path), 400, fmt="cs16")
        chunk = src.read_chunk(1.0)
        want = (wire.astype(np.float32) / 32768.0).view(np.complex64)
        np.testing.assert_array_equal(chunk, want)

    def test_cs16_recording_roundtrip(self, tmp_path):
        from radiocore_tpu.apps.iq import IQFileSource
        iq = (np.linspace(-0.9, 0.9, 256)
              + 1j * np.linspace(0.9, -0.9, 256)).astype(np.complex64)
        path = tmp_path / "rec.cs16"
        write_iq_file(str(path), iq, fmt="cs16")
        back = IQFileSource(str(path), 256, fmt="cs16").read_chunk(1.0)
        # scale skew (32767 enc / 32768 dec) + 0.5 LSB rounding
        np.testing.assert_allclose(back.view(np.float32),
                                   iq.view(np.float32), atol=1.5 / 32768)

    def test_unknown_format_rejected(self, tmp_path):
        from radiocore_tpu.apps.iq import IQFileSource
        path = tmp_path / "x.bin"
        np.zeros(4, np.int16).tofile(path)
        with pytest.raises(ValueError, match="unknown IQ format"):
            IQFileSource(str(path), 2, fmt="cs32")

    def test_native_rejects_wrong_dtype(self):
        from radiocore_tpu.native.build import (iq_convert_native,
                                                iq_native_available)
        if not iq_native_available():
            pytest.skip("no C++ toolchain")
        with pytest.raises(TypeError, match="expects dtype"):
            iq_convert_native(np.zeros(8, np.uint8), "cs16")

    def test_convert_trims_odd_scalar_count(self):
        from radiocore_tpu.apps.iq import convert_iq
        out = convert_iq(np.zeros(7, np.int16), "cs16")
        assert out.shape == (3,) and out.dtype == np.complex64


def test_receive_fm_warmup_and_ring_seconds():
    """The r5 streaming knobs: pipeline-priming warmup and configurable
    jitter-buffer depth run end-to-end and deliver every chunk."""
    import numpy as np
    from radiocore_tpu.apps import receive_fm
    from radiocore_tpu.apps.iq import SyntheticFmSource
    from radiocore_tpu.runtime.config import PipelineConfig, StationConfig
    from radiocore_tpu.runtime.metrics import Metrics

    config = PipelineConfig(input_rate=131072, demod_rate=65536,
                            audio_rate=16384,
                            stations=(StationConfig(frequency=0.0,
                                                    mode="wbfm"),))
    source = SyntheticFmSource(131072, [0], 65536)
    chunks = []

    class Sink:
        def write(self, audio):
            chunks.append(np.asarray(audio))

        def close(self):
            pass

    metrics = Metrics()
    receive_fm.run(config, source, Sink(), seconds=2.0,
                   metrics=metrics, wbfm_mode="fast",
                   ring_seconds=5.0, warmup=True)
    assert len(chunks) == 2
    assert chunks[0].shape == (16384, 2)
    snap = metrics.snapshot()
    assert snap.get("ring_overflows", 0) == 0
