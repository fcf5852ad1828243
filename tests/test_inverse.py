"""NNLS / mel_to_stft / griffinlim / mel_to_audio (functions/inverse.py)."""

from __future__ import annotations

import numpy as np
import pytest

from crossai_ts_spark.functions.dsp import melspectrogram, stft
from crossai_ts_spark.functions.inverse import griffinlim, mel_to_audio, mel_to_stft, nnls


def test_nnls_recovers_nonnegative_solution():
    rng = np.random.default_rng(0)
    A = np.abs(rng.normal(size=(20, 8)))
    Xtrue = np.abs(rng.normal(size=(8, 5)))
    B = A @ Xtrue
    X = nnls(A, B)
    assert np.linalg.norm(A @ X - B) / np.linalg.norm(B) < 1e-8
    assert (X >= 0).all()


def test_nnls_projects_infeasible():
    A = np.eye(3)
    B = np.array([[1.0], [-2.0], [3.0]])
    X = nnls(A, B)
    np.testing.assert_allclose(X, [[1.0], [0.0], [3.0]], atol=1e-9)


def test_mel_to_stft_recovers_dominant_bins():
    t = np.arange(4096)
    x = np.sin(2 * np.pi * 0.05 * t) + 0.5 * np.sin(2 * np.pi * 0.13 * t)
    S_true = np.abs(stft(x, 256, 64))
    M = melspectrogram(x, 1.0, 256, 64, n_mels=64)
    S_rec = mel_to_stft(M, sr=1.0, n_fft=256, power=2.0)
    assert S_rec.shape == S_true.shape
    assert S_rec.sum(axis=1).argmax() == S_true.sum(axis=1).argmax()


def test_griffinlim_spectral_convergence():
    t = np.arange(4096)
    x = np.sin(2 * np.pi * 0.05 * t)
    S = np.abs(stft(x, 256, 64))
    y = griffinlim(S, n_iter=32, hop=64, n_fft=256, length=x.size)
    S_y = np.abs(stft(y, 256, 64))
    f = min(S_y.shape[1], S.shape[1])
    sc = np.linalg.norm(S_y[:, :f] - S[:, :f]) / np.linalg.norm(S[:, :f])
    assert sc < 0.2
    with pytest.raises(ValueError):
        griffinlim(S, momentum=1.5)


def test_griffinlim_deterministic():
    S = np.abs(stft(np.sin(np.arange(2048) * 0.1), 256, 64))
    a = griffinlim(S, n_iter=4)
    b = griffinlim(S, n_iter=4)
    assert np.array_equal(a, b)


def test_mel_to_audio_roundtrip_length():
    x = np.sin(2 * np.pi * 0.05 * np.arange(4096))
    M = melspectrogram(x, 1.0, 256, 64, n_mels=64)
    y = mel_to_audio(M, sr=1.0, n_fft=256, hop=64, length=x.size)
    assert y.size == x.size and np.all(np.isfinite(y))
