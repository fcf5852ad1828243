"""Inverse spectral transforms: NNLS mel inversion + Griffin-Lim phase
reconstruction (caits/fe/inverse.py:16-330) — pure numpy.

  nnls          caits/fe/core_spectrum/_utils.py (librosa nnls): argmin
                ||A x - B||^2 s.t. x >= 0, here via projected gradient
                with Nesterov-style momentum (documented public method)
  mel_to_stft   inverse.py:16-69:  S = nnls(mel_basis, M) ** (1/power)
  griffinlim    inverse.py:71-270: iterative phase recovery with momentum
                (Perraudin et al. fast Griffin-Lim)
  mel_to_audio  inverse.py:273-330: mel_to_stft -> griffinlim
"""

from __future__ import annotations

import numpy as np

from .dsp import istft, mel_filterbank, stft


def nnls(A: np.ndarray, B: np.ndarray, n_iter: int = 200) -> np.ndarray:
    """min ||A X - B||_F^2  s.t. X >= 0, via accelerated projected
    gradient (step 1/L with L = ||A^T A||_2 bounded by its Frobenius
    norm). Deterministic; converges to the convex optimum."""
    A = np.asarray(A, dtype=np.float64)
    B = np.asarray(B, dtype=np.float64)
    AtA = A.T @ A
    AtB = A.T @ B
    L = np.linalg.norm(AtA, ord="fro") + 1e-12
    X = np.maximum(0.0, np.linalg.pinv(A) @ B)
    Y = X.copy()
    t = 1.0
    for _ in range(n_iter):
        G = AtA @ Y - AtB
        Xn = np.maximum(0.0, Y - G / L)
        tn = (1.0 + np.sqrt(1.0 + 4.0 * t * t)) / 2.0
        Y = Xn + ((t - 1.0) / tn) * (Xn - X)
        X, t = Xn, tn
    return X


def mel_to_stft(
    M: np.ndarray, sr: float = 22050, n_fft: int = 2048, power: float = 2.0,
    n_iter: int = 200,
) -> np.ndarray:
    """Approximate the linear-frequency magnitude STFT from a mel power
    spectrogram (caits/fe/inverse.py:16-69)."""
    M = np.asarray(M, dtype=np.float64)
    fb = mel_filterbank(sr, n_fft, n_mels=M.shape[0])
    inv = nnls(fb, M, n_iter=n_iter)
    return np.power(inv, 1.0 / power, where=inv > 0, out=np.zeros_like(inv))


def griffinlim(
    S: np.ndarray,
    n_iter: int = 32,
    hop: int = 64,
    n_fft: int = 256,
    momentum: float = 0.99,
    length: int | None = None,
    seed: int = 0,
) -> np.ndarray:
    """Phase reconstruction from a magnitude STFT (caits/fe/inverse.py:
    71-270, fast Griffin-Lim with momentum). Deterministic: phase init
    from a seeded generator (librosa uses random phases too)."""
    if momentum < 0 or momentum > 1:
        raise ValueError("momentum must be in [0, 1]")
    S = np.asarray(S, dtype=np.float64)
    rng = np.random.default_rng(seed)
    angles = np.exp(2j * np.pi * rng.random(S.shape))
    rebuilt = np.zeros_like(S, dtype=complex)
    for _ in range(n_iter):
        tprev = rebuilt
        x = istft(S * angles, n_fft=n_fft, hop=hop, length=length)
        rebuilt = stft(x, n_fft=n_fft, hop=hop)
        # pad/trim frame axis drift from the istft/stft round trip
        f = min(rebuilt.shape[1], S.shape[1])
        rebuilt = rebuilt[:, :f]
        if rebuilt.shape[1] < S.shape[1]:
            rebuilt = np.pad(rebuilt, ((0, 0), (0, S.shape[1] - rebuilt.shape[1])))
        upd = rebuilt - (momentum / (1.0 + momentum)) * tprev
        angles = upd / np.maximum(np.abs(upd), 1e-16)
    return istft(S * angles, n_fft=n_fft, hop=hop, length=length)


def mel_to_audio(
    M: np.ndarray, sr: float = 22050, n_fft: int = 256, hop: int = 64,
    power: float = 2.0, n_iter: int = 32, length: int | None = None,
) -> np.ndarray:
    """mel power spectrogram -> waveform (caits/fe/inverse.py:273-330)."""
    S = mel_to_stft(M, sr=sr, n_fft=n_fft, power=power)
    return griffinlim(S, n_iter=n_iter, hop=hop, n_fft=n_fft, length=length)
