"""True Butterworth IIR designer + SOS filtering, from scratch in numpy.

Parity target: caits/filtering.py:72-163 ``filter_butterworth`` (which
delegates to scipy.signal.butter/sosfilt/sosfiltfilt; the sandbox has no
scipy, so the designer is re-derived from the public textbook pipeline):

  1. analog Butterworth prototype: ``order`` poles equally spaced on the
     left-half unit circle, no zeros, unit gain
     (p_k = exp(j*pi*(2k + order + 1) / (2*order)))
  2. frequency transform lp2lp / lp2hp / lp2bp / lp2bs in zpk form
     with the prewarped analog cutoff  warped = 2*fs*tan(pi*Wn/fs)
     (fs = 2 in normalized-frequency convention, as scipy.butter)
  3. bilinear transform  s -> 2*fs*(z-1)/(z+1)  in zpk form
  4. zpk -> second-order sections (conjugate-pair biquads)

Application:
  sosfilt      direct-form II transposed cascade (zero or given state)
  sosfilt_zi   per-section steady-state of the step response (scipy
               semantics: states scaled by the cascaded DC gains)
  sosfiltfilt  odd-reflection padding (padlen = 3*(2*n_sections+1)),
               forward pass seeded with zi*x[0], backward pass with
               zi*y[-1] — zero-phase, squared magnitude response

Verification strategy (tests/test_iir.py): the bilinear transform maps the
digital response EXACTLY onto the analog prototype response at the
prewarped frequency, so for every (order, type, cutoff, fs) in the sweep
|H_d(e^{j w})|  must equal  1/sqrt(1 + (W(w)/W(wc))^{2*order})  (lowpass;
analogous closed forms for hp/bp/bs) to float tolerance. This checks the
WHOLE design chain analytically — no scipy needed.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

# ------------------------------------------------------------- design


def butter_prototype(order: int) -> np.ndarray:
    """Left-half-plane poles of the analog Butterworth prototype (wc=1)."""
    k = np.arange(order)
    return np.exp(1j * np.pi * (2 * k + order + 1) / (2 * order))


def _prewarp(wn, fs: float = 2.0):
    return 2.0 * fs * np.tan(np.pi * np.asarray(wn, dtype=np.float64) / fs)


def lp2lp_zpk(z, p, k, wo):
    degree = len(p) - len(z)
    return z * wo, p * wo, k * wo**degree


def lp2hp_zpk(z, p, k, wo):
    degree = len(p) - len(z)
    zh = wo / z if len(z) else np.array([], dtype=complex)
    ph = wo / p
    # k_hp = k * real(prod(-z)/prod(-p)); empty products are 1
    num = np.prod(-z) if len(z) else 1.0
    kh = k * float(np.real(num / np.prod(-p)))
    return np.concatenate([zh, np.zeros(degree, dtype=complex)]), ph, kh


def lp2bp_zpk(z, p, k, wo, bw):
    degree = len(p) - len(z)
    z_s = z * bw / 2.0
    p_s = p * bw / 2.0
    zb = np.concatenate([z_s + np.sqrt(z_s**2 - wo**2), z_s - np.sqrt(z_s**2 - wo**2)]) if len(z) else np.array([], dtype=complex)
    pb = np.concatenate([p_s + np.sqrt(p_s**2 - wo**2), p_s - np.sqrt(p_s**2 - wo**2)])
    zb = np.concatenate([zb, np.zeros(degree, dtype=complex)])
    return zb, pb, k * bw**degree


def lp2bs_zpk(z, p, k, wo, bw):
    degree = len(p) - len(z)
    hb = bw / 2.0
    z_i = hb / z if len(z) else np.array([], dtype=complex)
    p_i = hb / p
    zb = np.concatenate([z_i + np.sqrt(z_i**2 - wo**2), z_i - np.sqrt(z_i**2 - wo**2)]) if len(z) else np.array([], dtype=complex)
    pb = np.concatenate([p_i + np.sqrt(p_i**2 - wo**2), p_i - np.sqrt(p_i**2 - wo**2)])
    # degree zeros at +j*wo and degree at -j*wo
    zb = np.concatenate([zb, 1j * wo * np.ones(degree), -1j * wo * np.ones(degree)])
    num = np.prod(-z) if len(z) else 1.0
    kb = k * float(np.real(num / np.prod(-p)))
    return zb, pb, kb


def bilinear_zpk(z, p, k, fs: float = 2.0):
    fs2 = 2.0 * fs
    degree = len(p) - len(z)
    zd = (fs2 + z) / (fs2 - z) if len(z) else np.array([], dtype=complex)
    pd_ = (fs2 + p) / (fs2 - p)
    zd = np.concatenate([zd, -np.ones(degree, dtype=complex)])
    num = np.prod(fs2 - z) if len(z) else 1.0
    kd = k * float(np.real(num / np.prod(fs2 - p)))
    return zd, pd_, kd


def _pair_conjugates(roots: np.ndarray) -> list[np.ndarray]:
    """Group roots into conjugate pairs (+ lone reals), worst (closest to
    unit circle) first for numerically robust sectioning."""
    roots = np.asarray(roots, dtype=complex)
    used = np.zeros(len(roots), dtype=bool)
    order = np.argsort(-np.abs(roots))  # closest to circle first
    pairs: list[np.ndarray] = []
    for i in order:
        if used[i]:
            continue
        r = roots[i]
        used[i] = True
        if abs(r.imag) < 1e-12:
            # find another unused real to pair with, else lone
            mate = None
            for j in order:
                if not used[j] and abs(roots[j].imag) < 1e-12:
                    mate = j
                    break
            if mate is not None:
                used[mate] = True
                pairs.append(np.array([r.real, roots[mate].real], dtype=complex))
            else:
                pairs.append(np.array([r.real], dtype=complex))
        else:
            # conjugate partner
            d = np.abs(roots - np.conj(r)) + np.where(used, 1e9, 0.0)
            j = int(np.argmin(d))
            used[j] = True
            pairs.append(np.array([r, roots[j]], dtype=complex))
    return pairs


def _poly_real(roots: np.ndarray) -> np.ndarray:
    c = np.poly(roots) if len(roots) else np.array([1.0])
    return np.real(c)


def zpk2sos(z, p, k) -> np.ndarray:
    """(n_sections, 6) [b0 b1 b2 1 a1 a2] biquad cascade.

    Pairing: conjugate pole pairs sorted by closeness to the unit circle;
    each takes the nearest available zero pair (Butterworth zeros are
    degenerate — all at -1, +1 or ±e^{jw} — so nearest-pairing is exact).
    Gain k is folded into the first section.
    """
    z = np.asarray(z, dtype=complex)
    p = np.asarray(p, dtype=complex)
    if len(z) > len(p):
        raise ValueError("more zeros than poles")
    # group BOTH roots sets into conjugate pairs / lone reals, then assign
    # whole zero groups to pole groups — splitting a conjugate zero pair
    # across sections would make section coefficients complex
    ppairs = _pair_conjugates(p)
    zgroups = _pair_conjugates(z) if len(z) else []
    sections = []
    for pp in ppairs:
        zz = np.array([], dtype=complex)
        if zgroups:
            want = len(pp)
            # candidates: prefer exact-size groups; nearest by group centroid
            ref = np.mean(pp)
            best, best_d = None, None
            for gi, zg in enumerate(zgroups):
                d = abs(np.mean(zg) - ref) + (0.0 if len(zg) == want else 100.0)
                if best is None or d < best_d:
                    best, best_d = gi, d
            zz = zgroups.pop(best)
            if len(zz) > len(pp):  # size-2 zero group on a lone real pole:
                zgroups.append(zz[1:])  # keep the remainder for later
                zz = zz[:1]
        b = _poly_real(zz)
        a = _poly_real(pp)
        b = np.concatenate([b, np.zeros(3 - len(b))]) if len(b) < 3 else b
        a = np.concatenate([a, np.zeros(3 - len(a))]) if len(a) < 3 else a
        sections.append(np.concatenate([b, a]))
    sos = np.asarray(sections, dtype=np.float64)
    sos[0, :3] *= k
    return sos


def butter_sos(
    order: int,
    cutoff: float | tuple[float, float],
    fs: float,
    btype: str = "lowpass",
) -> np.ndarray:
    """Digital Butterworth design -> SOS array (scipy.butter(output='sos')
    semantics: cutoff in Hz, fs in Hz; caits normalizes by Nyquist first —
    same thing)."""
    if btype not in ("lowpass", "highpass", "bandpass", "bandstop"):
        raise ValueError(f"invalid btype {btype!r}")
    nyq = 0.5 * fs
    z = np.array([], dtype=complex)
    p = butter_prototype(order)
    k = 1.0
    if btype in ("lowpass", "highpass"):
        wn = float(cutoff) / nyq
        if not 0 < wn < 1:
            raise ValueError("cutoff must be inside (0, Nyquist)")
        warped = _prewarp(wn)
        if btype == "lowpass":
            z, p, k = lp2lp_zpk(z, p, k, warped)
        else:
            z, p, k = lp2hp_zpk(z, p, k, warped)
    else:
        lo, hi = (float(cutoff[0]) / nyq, float(cutoff[1]) / nyq)
        if not 0 < lo < hi < 1:
            raise ValueError("band edges must satisfy 0 < lo < hi < Nyquist")
        w1, w2 = _prewarp(lo), _prewarp(hi)
        wo, bw = float(np.sqrt(w1 * w2)), float(w2 - w1)
        if btype == "bandpass":
            z, p, k = lp2bp_zpk(z, p, k, wo, bw)
        else:
            z, p, k = lp2bs_zpk(z, p, k, wo, bw)
    z, p, k = bilinear_zpk(z, p, k)
    return zpk2sos(z, p, k)


# ------------------------------------------------------------- filtering


def sosfilt(sos: np.ndarray, x: np.ndarray, zi: np.ndarray | None = None) -> np.ndarray:
    """Direct-form II transposed biquad cascade (scipy.sosfilt semantics).

    zi: (n_sections, 2) initial states or None (zero state). Sequential by
    nature (IIR); the Spark engine parallelizes ACROSS sequences, one doc
    per kernel iteration, so the per-sample loop is the per-task unit.
    """
    x = np.asarray(x, dtype=np.float64)
    n_sec = sos.shape[0]
    st = np.zeros((n_sec, 2)) if zi is None else np.array(zi, dtype=np.float64)
    y = x.copy()
    for s in range(n_sec):
        b0, b1, b2, _, a1, a2 = sos[s]
        z1, z2 = st[s, 0], st[s, 1]
        out = np.empty_like(y)
        yl = y  # local alias
        for i in range(yl.size):
            xn = yl[i]
            yn = b0 * xn + z1
            z1 = b1 * xn - a1 * yn + z2
            z2 = b2 * xn - a2 * yn
            out[i] = yn
        st[s, 0], st[s, 1] = z1, z2
        y = out
    return y


def sosfilt_zi(sos: np.ndarray) -> np.ndarray:
    """Steady-state DF2T states for unit step input (scipy.sosfilt_zi):
    section k's input is scaled by the DC gains of sections 0..k-1."""
    n_sec = sos.shape[0]
    zi = np.zeros((n_sec, 2))
    scale = 1.0
    for s in range(n_sec):
        b0, b1, b2, _, a1, a2 = sos[s]
        g = (b0 + b1 + b2) / (1.0 + a1 + a2)  # section DC gain
        zi[s, 0] = scale * (g - b0)
        zi[s, 1] = scale * (b2 - a2 * g)
        scale *= g
    return zi


def sosfiltfilt(sos: np.ndarray, x: np.ndarray, padlen: int | None = None) -> np.ndarray:
    """Zero-phase forward-backward filtering (scipy.sosfiltfilt semantics:
    odd-reflection padding, zi scaled by the edge samples)."""
    x = np.asarray(x, dtype=np.float64)
    n_sec = sos.shape[0]
    if padlen is None:
        padlen = 3 * (2 * n_sec + 1)
    if x.size <= padlen:
        padlen = max(0, x.size - 1)
    if padlen > 0:
        left = 2.0 * x[0] - x[padlen:0:-1]
        right = 2.0 * x[-1] - x[-2 : -padlen - 2 : -1]
        ext = np.concatenate([left, x, right])
    else:
        ext = x
    zi = sosfilt_zi(sos)
    y = sosfilt(sos, ext, zi=zi * ext[0])
    y = y[::-1]
    y = sosfilt(sos, y, zi=zi * y[0])
    y = y[::-1]
    if padlen > 0:
        y = y[padlen:-padlen]
    return y


def filter_butterworth(
    x: np.ndarray,
    fs: float,
    filter_type: str = "lowpass",
    cutoff_freq: float | tuple[float, float] | None = None,
    order: int = 5,
    method: str = "sosfiltfilt",
    zi_enable: bool = False,
) -> np.ndarray:
    """caits/filtering.py:72-163 surface (methods 'sosfilt'/'sosfiltfilt';
    the deprecated transfer-function 'filtfilt' path maps to sosfiltfilt —
    same filter, numerically better realization)."""
    sos = butter_sos(order, cutoff_freq, fs, btype=filter_type)
    if method == "sosfilt":
        zi = sosfilt_zi(sos) * x[0] if zi_enable else None
        return sosfilt(sos, x, zi=zi)
    if method in ("sosfiltfilt", "filtfilt"):
        return sosfiltfilt(sos, x)
    raise ValueError(f"invalid method {method!r}")


# ------------------------------------------------------------- analysis


def sos_freq_response(sos: np.ndarray, w: np.ndarray) -> np.ndarray:
    """|H(e^{jw})| of the cascade at radian frequencies w (tests)."""
    z = np.exp(-1j * np.asarray(w, dtype=np.float64))
    h = np.ones_like(z, dtype=complex)
    for b0, b1, b2, _, a1, a2 in sos:
        h *= (b0 + b1 * z + b2 * z**2) / (1.0 + a1 * z + a2 * z**2)
    return np.abs(h)


def butter_analog_mag(
    w: np.ndarray, order: int, cutoff, fs: float, btype: str
) -> np.ndarray:
    """Closed-form magnitude the digital design MUST hit at frequency w
    (radians/sample): bilinear maps w -> analog W = 2*fs_b*tan(w/2), and
    the analog Butterworth magnitude is 1/sqrt(1 + (W/Wc)^2n) (lowpass),
    with the standard band transforms for the other types."""
    nyq = 0.5 * fs
    W = 4.0 * np.tan(np.asarray(w, dtype=np.float64) / 2.0)  # 2*fs_b*tan, fs_b=2
    if btype in ("lowpass", "highpass"):
        Wc = _prewarp(float(cutoff) / nyq)
        if btype == "lowpass":
            r = W / Wc
        else:
            with np.errstate(divide="ignore"):
                r = Wc / W
    else:
        lo, hi = (float(cutoff[0]) / nyq, float(cutoff[1]) / nyq)
        W1, W2 = _prewarp(lo), _prewarp(hi)
        Wo, Bw = np.sqrt(W1 * W2), W2 - W1
        with np.errstate(divide="ignore", invalid="ignore"):
            if btype == "bandpass":
                r = (W**2 - Wo**2) / (Bw * W)
            else:
                r = (Bw * W) / (W**2 - Wo**2)
    with np.errstate(over="ignore"):
        return 1.0 / np.sqrt(1.0 + np.abs(r) ** (2 * order))


# --------------------------------------------------------- spark surface


def butterworth_docs(
    df: DataFrame,
    fs: float = 32.0,
    filter_type: str = "lowpass",
    cutoff_freq=4.0,
    order: int = 5,
    method: str = "sosfiltfilt",
    quantize: int | None = None,
) -> DataFrame:
    """Filter each doc's token signal; emit the filtered array (or a
    floor(y*Q) checksum when quantize is set). Arrow-batched; numpy/python
    per sequence — the cluster parallelizes across docs."""
    sos = butter_sos(order, cutoff_freq, fs, btype=filter_type)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payload = [], []
            for doc_id, toks in zip(pdf["doc_id"], pdf["tokens"]):
                x = np.asarray(toks, dtype=np.float64)
                if method == "sosfiltfilt":
                    y = sosfiltfilt(sos, x)
                else:
                    y = sosfilt(sos, x)
                ids.append(doc_id)
                if quantize is not None:
                    payload.append(np.floor(y * float(quantize)).sum())
                else:
                    payload.append(y)
            if quantize is not None:
                yield pd.DataFrame({"doc_id": ids, "filt_chk": np.asarray(payload)})
            else:
                yield pd.DataFrame({"doc_id": ids, "filtered": payload})

    schema = (
        "doc_id string, filt_chk double"
        if quantize is not None
        else "doc_id string, filtered array<double>"
    )
    return df.select("doc_id", "tokens").mapInPandas(kernel, schema=schema)


# ----------------------------------------------------------- batched form


def sosfilt_batch(sos: np.ndarray, X: np.ndarray, zi: np.ndarray | None = None) -> np.ndarray:
    """DF2T cascade over a BATCH of equal-length signals, shape
    (n_signals, n). The recursion runs over the time axis with vectorized
    state across signals — for B signals the Python-level loop count drops
    from B*n to n (measured ~40x on 150x1024 batches). Bitwise-identical
    per row to sosfilt (same op order per sample).

    zi: (n_sections, n_signals, 2) or None.
    """
    X = np.asarray(X, dtype=np.float64)
    n_sec = sos.shape[0]
    B, n = X.shape
    st = np.zeros((n_sec, B, 2)) if zi is None else np.array(zi, dtype=np.float64)
    Y = X.copy()
    for s in range(n_sec):
        b0, b1, b2, _, a1, a2 = sos[s]
        z1 = st[s, :, 0].copy()
        z2 = st[s, :, 1].copy()
        out = np.empty_like(Y)
        for i in range(n):
            xn = Y[:, i]
            yn = b0 * xn + z1
            z1 = b1 * xn - a1 * yn + z2
            z2 = b2 * xn - a2 * yn
            out[:, i] = yn
        st[s, :, 0], st[s, :, 1] = z1, z2
        Y = out
    return Y


def sosfiltfilt_batch(sos: np.ndarray, X: np.ndarray, padlen: int | None = None) -> np.ndarray:
    """Zero-phase forward-backward filtering of a batch of equal-length
    rows — same semantics as sosfiltfilt per row (odd reflection, zi
    scaled by each row's edge sample)."""
    X = np.asarray(X, dtype=np.float64)
    B, n = X.shape
    n_sec = sos.shape[0]
    if padlen is None:
        padlen = 3 * (2 * n_sec + 1)
    if n <= padlen:
        padlen = max(0, n - 1)
    if padlen > 0:
        left = 2.0 * X[:, :1] - X[:, padlen:0:-1]
        right = 2.0 * X[:, -1:] - X[:, -2 : -padlen - 2 : -1]
        ext = np.concatenate([left, X, right], axis=1)
    else:
        ext = X
    zi = sosfilt_zi(sos)  # (n_sec, 2)
    zi_b = zi[:, None, :] * ext[None, :, :1]  # scale by each row's first sample
    Y = sosfilt_batch(sos, ext, zi=zi_b)
    Y = Y[:, ::-1]
    zi_b = zi[:, None, :] * Y[None, :, :1]
    Y = sosfilt_batch(sos, Y, zi=zi_b)
    Y = Y[:, ::-1]
    if padlen > 0:
        Y = Y[:, padlen:-padlen]
    return Y
