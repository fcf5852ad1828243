"""PCEN / HPSS / phase vocoder / time-stretch / pitch-shift / polyphase
resample (functions/dsp2.py) — analytic, scipy-free verification."""

from __future__ import annotations

import numpy as np
import pytest

from crossai_ts_spark.functions.dsp2 import (
    hpss,
    hpss_signal,
    pcen,
    pcen_base,
    phase_vocoder,
    pitch_shift_ts,
    resample_poly,
    resample_signal,
    time_stretch_ts,
    time_warp_np,
)


def test_pcen_steady_state_closed_form():
    """Constant spectrogram: after the IIR transient the output equals the
    Wang et al. closed form exactly."""
    E = np.full((5, 400), 4.0)
    out = pcen_base(E, s=0.5)
    expect = (4.0 / (1e-6 + 4.0) ** 0.98 + 2) ** 0.5 - 2**0.5
    np.testing.assert_allclose(out[:, -1], expect, rtol=1e-9)


def test_pcen_surface_b_from_time_constant():
    S = np.abs(np.random.default_rng(0).normal(size=(8, 50)))
    out = pcen(S, sr=100, hop_length=10, time_constant=0.4)
    assert out.shape == S.shape and np.all(np.isfinite(out))
    with pytest.raises(ValueError):
        pcen(S, power=0)
    with pytest.raises(ValueError):
        pcen(S, b=1.5)


def test_pcen_flattens_dynamics():
    """PCEN's point: a 100x level difference compresses to near-parity."""
    loud = np.full((1, 300), 100.0)
    quiet = np.full((1, 300), 1.0)
    pl = pcen_base(loud, s=0.1)[0, -1]
    pq = pcen_base(quiet, s=0.1)[0, -1]
    assert pl / pq < 2.0  # raw ratio was 100x


def test_hpss_masks_sum_to_signal():
    """With margin=1 and power=2 the soft masks are complementary:
    H + P == S."""
    rng = np.random.default_rng(2)
    S = np.abs(rng.normal(size=(33, 40))) + 0.1
    H, P = hpss(S, kernel_size=5)
    np.testing.assert_allclose(H + P, S, rtol=1e-9)


def test_hpss_separates_tone_from_clicks():
    t = np.arange(4096)
    x_h = np.sin(2 * np.pi * 0.05 * t)
    x_p = np.zeros(4096)
    x_p[::512] = 10.0
    H, P = hpss_signal(x_h + x_p, n_fft=256, hop=64)
    assert np.corrcoef(H[300:-300], x_h[300:-300])[0, 1] > 0.9
    # percussive energy concentrates at the click positions
    assert abs(P[512]) > 10 * abs(P[300])


def test_phase_vocoder_rate_changes_frame_count():
    D = np.ones((129, 100), dtype=complex)
    assert phase_vocoder(D, rate=2.0).shape[1] == 50
    assert phase_vocoder(D, rate=0.5).shape[1] == 200


def test_time_stretch_preserves_frequency():
    """Stretching changes duration, not pitch: the dominant DFT bin of a
    sine (in cycles/sample) stays put."""
    t = np.arange(4096)
    x = np.sin(2 * np.pi * 0.03 * t)
    y = time_stretch_ts(x, 2.0)
    assert y.size == 2048
    f_x = np.abs(np.fft.rfft(x[256:-256]))
    f_y = np.abs(np.fft.rfft(y[256:-256]))
    peak_x = np.argmax(f_x) / f_x.size
    peak_y = np.argmax(f_y) / f_y.size
    assert abs(peak_x - peak_y) / peak_x < 0.05
    with pytest.raises(ValueError):
        time_stretch_ts(x, 0.0)


def test_pitch_shift_octave_doubles_peak_bin():
    t = np.arange(4096)
    x = np.sin(2 * np.pi * 0.01 * t)
    y = pitch_shift_ts(x, sr=1.0, n_steps=12)
    assert y.size == x.size
    p0 = np.argmax(np.abs(np.fft.rfft(x)))
    p1 = np.argmax(np.abs(np.fft.rfft(y)))
    assert abs(p1 - 2 * p0) <= 2


def test_resample_poly_sine_parity():
    x = np.sin(2 * np.pi * 0.02 * np.arange(3000))
    y = resample_poly(x, 3, 2)
    want = np.sin(2 * np.pi * 0.02 * np.arange(y.size) * 2 / 3)
    assert np.abs(y[100:-100] - want[100:-100]).max() < 1e-3
    assert resample_poly(x, 5, 5).size == x.size  # identity via gcd


def test_resample_signal_rates():
    x = np.sin(2 * np.pi * 50 * np.arange(48000) / 48000)
    y = resample_signal(x, 48000, 16000)
    assert y.size == 16000
    with pytest.raises(ValueError):
        resample_signal(x, 44100.5, 16000)


def test_resample_antialiasing():
    """Content above the target Nyquist must be attenuated, not aliased."""
    n = 6000
    hi = np.sin(2 * np.pi * 0.45 * np.arange(n))  # near orig Nyquist
    y = resample_poly(hi, 1, 3)  # target Nyquist = 1/6 cycles/sample
    assert np.sqrt((y[50:-50] ** 2).mean()) < 0.05 * np.sqrt((hi**2).mean())


def test_resample_fft_sine_parity():
    """A periodic-over-the-frame sinusoid resamples EXACTLY (to FFT
    precision) in the Fourier domain — no filter transition band."""
    from crossai_ts_spark.functions.dsp2 import resample_fft

    n = 1200
    k = 37  # integer number of cycles -> periodic over the frame
    x = np.sin(2 * np.pi * k * np.arange(n) / n)
    for num in (1800, 600, 800):
        y = resample_fft(x, num)
        want = np.sin(2 * np.pi * k * np.arange(num) / num)
        assert y.size == num
        assert np.abs(y - want).max() < 1e-9, num
    # round-trip up then back down is near-identity
    rt = resample_fft(resample_fft(x, 2400), 1200)
    assert np.abs(rt - x).max() < 1e-9
    # Nyquist cosine on even-length input survives upsampling
    c = np.cos(np.pi * np.arange(64))
    u = resample_fft(c, 128)
    assert np.abs(u[::2] - c).max() < 1e-9


def test_resample_signal_fft_mode():
    from crossai_ts_spark.functions.dsp2 import resample_signal

    x = np.sin(2 * np.pi * 60 * np.arange(4800) / 4800)
    y = resample_signal(x, 48000, 16000, mode="fft")
    assert y.size == 1600
    want = np.sin(2 * np.pi * 60 * np.arange(1600) / 1600)
    assert np.abs(y - want).max() < 1e-9
    with pytest.raises(ValueError):
        resample_signal(x, 48000, 16000, mode="nonsense_mode")


def test_time_warp_deterministic_and_bounded():
    x = np.sin(np.arange(500) * 0.05)
    a = time_warp_np(x, seed=11)
    b = time_warp_np(x, seed=11)
    assert np.array_equal(a, b)
    assert a.shape == x.shape
    assert a[0] == x[0] and abs(a[-1] - x[-1]) < 1e-9
    assert not np.array_equal(a, x)  # it actually warps
    assert a.min() >= x.min() - 1e-9 and a.max() <= x.max() + 1e-9  # interp bounds


def test_resample_fir_exact_formula_matches_resample_poly():
    """The strided per-output dot product behind the resample_fir_exact
    full oracle is the same math as resample_poly's
    zero-stuff -> convolve -> decimate (only summation order differs)."""
    import numpy as np

    from crossai_ts_spark.entry_queries import _fir_exact_taps
    from crossai_ts_spark.functions.dsp2 import resample_poly

    rng = np.random.default_rng(11)
    x = rng.integers(0, 255, 64).astype(np.float64)
    y_poly = resample_poly(x, 2, 3)
    taps = np.asarray(_fir_exact_taps())
    y_manual = np.array([
        sum(x[s] * taps[72 + 3 * j - 2 * s]
            for s in range(64) if 0 <= 72 + 3 * j - 2 * s <= 144)
        for j in range(43)
    ])
    assert y_poly.size == 43
    np.testing.assert_allclose(y_manual, y_poly, rtol=1e-12, atol=1e-12)


def test_resample_soxr_quality_ladder():
    """soxr_* presets map to the polyphase engine; higher quality = longer
    prototype = better stopband (less energy above the new Nyquist)."""
    import numpy as np

    from crossai_ts_spark.functions.dsp2 import resample_signal

    n = 4096
    t = np.arange(n)
    # a tone just above the 4 kHz target Nyquist: whatever the anti-alias
    # filter fails to remove folds to 8000 - 4400 = 3600 Hz in the output
    x = np.sin(2 * np.pi * 4400 * t / 16000)
    hq = resample_signal(x, 16000, 8000, mode="soxr_hq")
    qq = resample_signal(x, 16000, 8000, mode="soxr_qq")
    assert hq.size == qq.size == n // 2
    # identical to the default polyphase path at matching taps
    assert np.array_equal(hq, resample_signal(x, 16000, 8000, mode="polyphase"))

    def alias_energy(y):
        sp = np.abs(np.fft.rfft(y[64:-64]))
        f = np.fft.rfftfreq(y[64:-64].size, 1 / 8000)
        return float((sp[(f > 3500) & (f < 3700)] ** 2).sum())

    assert alias_energy(hq) < alias_energy(qq) / 10  # longer filter rejects more


def test_pcen_docs_matches_numpy_fold_and_reference_surface(spark):
    """pcen_docs' JVM fold == an explicit numpy float64 fold with the same
    op order, chk-EXACT; and the per-token v values are pcen_base with
    alpha=1, r=0.5 (reference surface, allclose — pcen_base uses **0.5
    which may differ from sqrt by an ulp)."""
    import numpy as np

    from crossai_ts_spark.functions.dsp2 import pcen_base, pcen_docs
    from crossai_ts_spark.sources.tokenize import tokenize_documents

    rows = [(i, "the quick brown fox %d jumps" % i * (i + 1), "en", "t") for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    got = pcen_docs(tokenize_documents(docs)).toPandas().set_index("doc_id").pcen_chk

    s, eps, delta, Q = 0.1, 1e-6, 2.0, 1048576.0
    for i, text, _, _ in rows:
        E = np.array([ord(c) for c in text], dtype=np.float64)
        m, chk = 0.0, 0.0
        for e in E:
            m = (1.0 - s) * m + s * e
            v = np.sqrt(e / (eps + m) + delta) - np.sqrt(delta)
            chk += np.floor(v * Q)
        assert got.loc[str(i)] == int(chk)
        # reference-surface tie: same values through pcen_base(alpha=1, r=.5)
        ref = pcen_base(E[None, :], alpha=1.0, delta=delta, r=0.5, s=s, eps=eps)[0]
        m2, vs = 0.0, []
        for e in E:
            m2 = (1.0 - s) * m2 + s * e
            vs.append(np.sqrt(e / (eps + m2) + delta) - np.sqrt(delta))
        assert np.allclose(ref, np.array(vs), rtol=1e-12)
