"""UHJ / Super Stereo codecs (core/uhjfilter.cpp) and the wide-band +90°
phase shifter (common/phase_shifter.hpp).

The phase shift is a linear FIR whose even-offset taps are zero; the
reference applies it per voice in the time domain (SIMD) or via a
segmented FFT.  Here whole blocks go through one batched FFT correlation:

    j(x)[i] = sum_j c[j] * x[i + 2*j]        (j in [0, N/2))

with the batch axis covering every UHJ voice's S/DT line at once.

Decode equations (uhjfilter.cpp:280-298, N3D output scaling):
    S = L + R,  D = L - R
    W = 0.981532*S + 0.161245010788*j(1.01449414406*D + 0.940383607152*T)
    X = 0.512550829698*S -          j(1.01449414406*D + 0.940383607152*T)
    Y = 0.974857725791*D - 0.82840763305*T + j(0.228577809582*S)
    Z = 1.25332058063*Q

Super Stereo decode (uhjfilter.cpp:429-446, N3D output scaling; w is the
width control, 0 <= w <= 0.7, pre-applied to D):
    S = L + R,  D = (L - R) * w
    W = 0.6098637*S + 0.6896511*j(D)
    X = 1.05631501729*S - 0.934107402059*j(D)
    Y = 2.06031664957*D + 0.264078754323*j(S)

Each voice consumes T + N/2 input samples per block (the shifter is
non-causal: N/2 look-ahead) plus an N/2-1 sample carried history.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

f32 = np.float32

FILTER_SIZE = 256          # UhjQualityType::FIR256
FILTER_SIZE_HQ = 512       # UhjQualityType::FIR512
PAD = FILTER_SIZE // 2     # FIR256 decoder input padding (uhjfilter.h:111)
HIST = PAD - 1             # FIR256 carried phase-shifter history


def fir_pad(n: int = FILTER_SIZE) -> int:
    return n // 2


def fir_hist(n: int = FILTER_SIZE) -> int:
    return n // 2 - 1

# Decoder scale factors (uhjfilter.cpp:280-298)
W_S, W_JDT = 0.981532, 0.161245010788
X_S = 0.512550829698
Y_D, Y_T, Y_JS = 0.974857725791, -0.82840763305, 0.228577809582
Z_Q = 1.25332058063
DT_D, DT_T = 1.01449414406, 0.940383607152

# Super Stereo (uhjfilter.cpp:448-523)
SS_W_S, SS_W_JD = 0.6098637, 0.6896511
SS_X_S, SS_X_JD = 1.05631501729, -0.934107402059
SS_Y_D, SS_Y_JS = 2.06031664957, 0.264078754323


@functools.lru_cache
def phase_shifter_coeffs(n: int = FILTER_SIZE) -> np.ndarray:
    """PhaseShifterT<N> coefficients (phase_shifter.hpp:62-83), f64 gen."""
    half = n // 2
    c = np.zeros(half)
    for i in range(half):
        k = (i * 2 + 1) - half
        w = 2.0 * np.pi / (half - 1) * i
        window = (0.3635819 - 0.4891775 * np.cos(w) + 0.1365995 * np.cos(2 * w)
                  - 0.0106411 * np.cos(3 * w))
        c[i] = window * 2.0 / (np.pi * k)
    return c.astype(f32)


@functools.lru_cache
def _shift_kernel_fft(nfft: int, n: int = FILTER_SIZE) -> np.ndarray:
    """conj(rfft(k2)) for the strided correlation kernel k2[2j] = c[j]."""
    c = phase_shifter_coeffs(n)
    k2 = np.zeros(n - 1, f32)
    k2[0::2] = c
    return np.conj(np.fft.rfft(k2, nfft)).astype(np.complex64)


def phase_shift(x_ext: jax.Array, T: int, n: int = FILTER_SIZE) -> jax.Array:
    """Batched +90° shift: x_ext [B, T + N - 1] -> [B, T].

    y[i] = sum_j c[j] * x_ext[i + 2j], via one FFT correlation per line.
    """
    L = x_ext.shape[-1]
    nfft = 1
    while nfft < L:
        nfft <<= 1
    K = jnp.asarray(_shift_kernel_fft(nfft, n))
    Y = jnp.fft.rfft(x_ext, n=nfft, axis=-1) * K
    return jnp.fft.irfft(Y, n=nfft, axis=-1)[..., :T].astype(jnp.float32)


def uhj_decode(chans: jax.Array, dt_hist: jax.Array, s_hist: jax.Array,
               T: int, n_input: int, n: int = FILTER_SIZE):
    """Batched UHJ2/3/4 decode (UhjDecoder::decode, uhjfilter.cpp:300-361).

    Args:
      chans: [U, C, T + n//2] resampled voice channels (C = 3 or 4;
        UHJ2 voices have a zero-filled third line).
      dt_hist/s_hist: [U, n//2 - 1] carried shifter histories.
      T: output frames; n_input: 2, 3 or 4 (buffer channels).
      n: FIR tier (256 or 512 taps).
    Returns (out [U, C, T] with W/X/Y[/Z], dt_hist', s_hist').
    """
    left, right = chans[:, 0], chans[:, 1]
    tch = chans[:, 2] if n_input >= 3 else jnp.zeros_like(left)
    s = left + right
    d = left - right

    hist = fir_hist(n)
    dt = f32(DT_D) * d + f32(DT_T) * tch                 # [U, T+n/2]
    dt_ext = jnp.concatenate([dt_hist, dt], axis=1)      # [U, T+N-1]
    jdt = phase_shift(dt_ext, T, n)
    new_dt_hist = dt_ext[:, T:T + hist]

    s_ext = jnp.concatenate([s_hist, s], axis=1)
    js = phase_shift(s_ext, T, n)
    new_s_hist = s_ext[:, T:T + hist]

    st, dtr, tt = s[:, :T], d[:, :T], tch[:, :T]
    w = f32(W_S) * st + f32(W_JDT) * jdt
    x = f32(X_S) * st - jdt
    y = f32(Y_D) * dtr + f32(Y_T) * tt + f32(Y_JS) * js
    outs = [w, x, y]
    if chans.shape[1] >= 4:
        outs.append(f32(Z_Q) * chans[:, 3, :T])
    return jnp.stack(outs, axis=1), new_dt_hist, new_s_hist


def super_stereo_decode(chans: jax.Array, dt_hist: jax.Array,
                        s_hist: jax.Array, width: jax.Array, T: int,
                        n: int = FILTER_SIZE, j_sign: float = 1.0):
    """Batched Super Stereo decode (UhjStereoDecoder, uhjfilter.cpp:430-523).

    chans: [U, 3, T + n//2] (third line zero); width: [U] (EnhWidth <= 0.7).
    ``j_sign=-1`` gives the TSME stereo decoder (core/tsmefilter.cpp:332-430:
    identical matrix with the phase shift reversed to match the TSME
    encoder's phase convention).
    """
    hist = fir_hist(n)
    left, right = chans[:, 0], chans[:, 1]
    s = left + right
    d = (left - right) * width[:, None]

    d_ext = jnp.concatenate([dt_hist, d], axis=1)
    jd = phase_shift(d_ext, T, n) * f32(j_sign)
    new_dt_hist = d_ext[:, T:T + hist]

    s_ext = jnp.concatenate([s_hist, s], axis=1)
    js = phase_shift(s_ext, T, n) * f32(j_sign)
    new_s_hist = s_ext[:, T:T + hist]

    st, dtr = s[:, :T], d[:, :T]
    w = f32(SS_W_S) * st + f32(SS_W_JD) * jd
    x = f32(SS_X_S) * st + f32(SS_X_JD) * jd
    y = f32(SS_Y_D) * dtr + f32(SS_Y_JS) * js
    return jnp.stack([w, x, y], axis=1), new_dt_hist, new_s_hist


# --- UHJ output encoder (UhjEncoder, uhjfilter.cpp:82-215) ------------------

ENC_S_W, ENC_S_X = 0.4698463, 0.0757602682546
ENC_JD_W, ENC_JD_X = -0.17101005, 0.208149636675
ENC_D_Y = 0.267586995182
ENC_T_JW, ENC_T_JX = -0.1432, 0.5317025735
ENC_T_Y = -0.57735026919
ENC_Q_Z = 0.797880458882
ENC_SEGMENT = 128                           # sSegmentSize = sFftLength/2
ENC_DELAY = FILTER_SIZE // 2 + ENC_SEGMENT  # sFilterDelay = N/2 + seg

class UhjEncoderState:
    """Stereo-UHJ FIR output post-process, block-batched (UhjEncoder<N>,
    uhjfilter.cpp:82-215; n = 256 or 512 taps).

    The direct S path is delayed by sFilterDelay (= n/2 + 128) to align
    with the shifted D path; state carries the delayed W/X/Y tails and the
    shifter history.
    """

    def __init__(self, n: int = FILTER_SIZE):
        self.n = n
        self.delay = n // 2 + ENC_SEGMENT

    def init(self):
        return {
            "wxy": jnp.zeros((3, self.delay), jnp.float32),
            "jwx_hist": jnp.zeros(fir_hist(self.n) + self.delay,
                                  jnp.float32),
        }

    def encode(self, state: dict, w, x, y, T: int):
        """(state, W,X,Y [T]) -> (state', left [T], right [T])."""
        d = self.delay
        wd = jnp.concatenate([state["wxy"][0], w])
        xd = jnp.concatenate([state["wxy"][1], x])
        yd = jnp.concatenate([state["wxy"][2], y])
        new_wxy = jnp.stack([wd[T:], xd[T:], yd[T:]])

        # j(-0.17101005*W + 0.208149636675*X) on the *undelayed* signal so
        # the shifter's n/2-1 causal core lines up with the S delay.
        wx = f32(ENC_JD_W) * w + f32(ENC_JD_X) * x
        wx_ext = jnp.concatenate([state["jwx_hist"], wx])
        jwx = phase_shift(wx_ext[None], T, self.n)[0]
        new_hist = wx_ext[T:T + fir_hist(self.n) + d]

        s = f32(ENC_S_W) * wd[:T] + f32(ENC_S_X) * xd[:T]
        dd = jwx + f32(ENC_D_Y) * yd[:T]
        return ({"wxy": new_wxy, "jwx_hist": new_hist}, s + dd, s - dd)


class TsmeEncoderState:
    """Stereo-TSME FIR output post-process (TsmeEncoder<N>,
    tsmefilter.cpp:138-278): like the UHJ encoder but the height channel
    folds into S and the inputs arrive in ACN order (W, Y, Z, X)."""

    def __init__(self, n: int = FILTER_SIZE):
        self.n = n
        self.delay = n // 2 + ENC_SEGMENT

    def init(self):
        return {
            "wyzx": jnp.zeros((4, self.delay), jnp.float32),
            "jwx_hist": jnp.zeros(fir_hist(self.n) + self.delay,
                                  jnp.float32),
        }

    def encode(self, state: dict, w, y, z, x, T: int):
        d = self.delay
        wd = jnp.concatenate([state["wyzx"][0], w])
        yd = jnp.concatenate([state["wyzx"][1], y])
        zd = jnp.concatenate([state["wyzx"][2], z])
        xd = jnp.concatenate([state["wyzx"][3], x])
        new_wyzx = jnp.stack([wd[T:], yd[T:], zd[T:], xd[T:]])

        wx = f32(TSME_D_W) * w + f32(TSME_D_X) * x
        wx_ext = jnp.concatenate([state["jwx_hist"], wx])
        jwx = phase_shift(wx_ext[None], T, self.n)[0]
        new_hist = wx_ext[T:T + fir_hist(self.n) + d]

        s = (f32(TSME_S_W) * wd[:T] + f32(TSME_S_X) * xd[:T]
             + f32(TSME_S_Z) * zd[:T])
        dd = jwx + f32(TSME_D_Y) * yd[:T]
        return ({"wyzx": new_wyzx, "jwx_hist": new_hist}, s + dd, s - dd)


# --- IIR quality tier (the default: UhjQualityType::Default == IIR) ----------
#
# core/allpass_iir.hpp: two cascades of four 2nd-order all-pass sections,
# Filter1 giving an N-degree phase shift (applied to the direct paths) and
# Filter2 giving N+90 degrees (applied one sample ahead: the j() operator
# with sInputPadding = 1).  Each section y = a*x + z0; z0' = z1;
# z1' = a*y - x is exactly a TDF2 biquad with coefficients [a, 0, -1, 0, -a],
# so the chunk-parallel biquad kernel applies, state-layout identical.

FILTER1_COEFF = np.array([0.479400865589, 0.876218493539,
                          0.976597589508, 0.997499255936], f32)
FILTER2_COEFF = np.array([0.161758498368, 0.733028932341,
                          0.945349700329, 0.990599156684], f32)
IIR_PAD = 1


def _prime4(x0: jax.Array, state: jax.Array, coeffs: np.ndarray):
    """processOne state priming for the +90 filters (allpass_iir.hpp:35-48).

    The reference consumes the stream's first sample once before the first
    block (the j() filters run one sample ahead).  Priming applies whenever
    the filter state is still all-zero: a zero state means no nonzero input
    was ever consumed, which is exactly the not-yet-primed condition.
    """
    allzero = jnp.all(state == 0.0, axis=(1, 2))              # [B]
    x = x0
    cols = []
    for i in range(4):
        a = f32(coeffs[i])
        y = a * x
        cols.append(jnp.stack([jnp.zeros_like(x), a * y - x], axis=-1))
        x = y
    primed = jnp.stack(cols, axis=1)                          # [B, 4, 2]
    return jnp.where(allzero[:, None, None], primed, state)


def _allpass4(x: jax.Array, state: jax.Array, coeffs: np.ndarray):
    """Four cascaded all-pass sections over [B, T]; state [B, 4, 2]."""
    from .filters import _biquad_chunked_single

    B, T = x.shape
    new_states = []
    for i in range(4):
        a = float(coeffs[i])
        cf = jnp.broadcast_to(
            jnp.asarray([a, 0.0, -1.0, 0.0, -a], jnp.float32),
            (T // 32, B, 5))
        x, z = _biquad_chunked_single(x, state[:, i], cf, 32)
        new_states.append(z)
    return x, jnp.stack(new_states, axis=1)


def uhj_decode_iir(chans: jax.Array, st: dict, T: int, n_input: int):
    """Batched UhjDecoderIIR::decode (uhjfilter.cpp:362-424).

    chans: [U, C, >= T+1]; st: {"f2dt","f1s","f1dt","f2s"[,"f1q"]}: [U,4,2].
    The one-sample state priming of the very first block (processOne) is
    approximated by a zero initial state; exact when the stream starts at
    silence (the common case: sources begin at a zero crossing or fade in).
    Returns (out [U, C, T], st').
    """
    left, right = chans[:, 0], chans[:, 1]
    tch = chans[:, 2] if n_input >= 3 else jnp.zeros_like(left)
    s = left + right
    d = left - right
    dt = f32(DT_D) * d + f32(DT_T) * tch

    jdt, f2dt = _allpass4(dt[:, 1:T + 1],
                          _prime4(dt[:, 0], st["f2dt"], FILTER2_COEFF),
                          FILTER2_COEFF)
    f1s_y, f1s = _allpass4(s[:, :T], st["f1s"], FILTER1_COEFF)
    dty = f32(Y_D) * d[:, :T] + f32(Y_T) * tch[:, :T]
    f1dt_y, f1dt = _allpass4(dty, st["f1dt"], FILTER1_COEFF)
    js, f2s = _allpass4(s[:, 1:T + 1],
                        _prime4(s[:, 0], st["f2s"], FILTER2_COEFF),
                        FILTER2_COEFF)

    w = f32(W_S) * f1s_y + f32(W_JDT) * jdt
    x = f32(X_S) * f1s_y - jdt
    y = f1dt_y + f32(Y_JS) * js
    outs = [w, x, y]
    new_st = {"f2dt": f2dt, "f1s": f1s, "f1dt": f1dt, "f2s": f2s}
    if chans.shape[1] >= 4:
        f1q_y, f1q = _allpass4(chans[:, 3, :T], st["f1q"], FILTER1_COEFF)
        outs.append(f32(Z_Q) * f1q_y)
        new_st["f1q"] = f1q
    return jnp.stack(outs, axis=1), new_st


def super_stereo_decode_iir(chans: jax.Array, st: dict, width: jax.Array,
                            T: int, j_sign: float = 1.0):
    """Batched UhjStereoDecoderIIR::decode (uhjfilter.cpp:525-600).

    Width changes apply immediately (the reference interpolates the width
    over the first block after a change; a one-block transient).
    ``j_sign=-1`` = the TSME stereo decoder (tsmefilter.cpp:429-505).
    """
    left, right = chans[:, 0], chans[:, 1]
    s = left + right
    d = (left - right) * width[:, None]

    f1s_y, f1s = _allpass4(s[:, :T], st["f1s"], FILTER1_COEFF)
    jd, f2dt = _allpass4(d[:, 1:T + 1],
                         _prime4(d[:, 0], st["f2dt"], FILTER2_COEFF),
                         FILTER2_COEFF)
    js, f2s = _allpass4(s[:, 1:T + 1],
                        _prime4(s[:, 0], st["f2s"], FILTER2_COEFF),
                        FILTER2_COEFF)
    f1d_y, f1dt = _allpass4(d[:, :T], st["f1dt"], FILTER1_COEFF)

    jd = jd * f32(j_sign)
    js = js * f32(j_sign)
    w = f32(SS_W_S) * f1s_y + f32(SS_W_JD) * jd
    x = f32(SS_X_S) * f1s_y + f32(SS_X_JD) * jd
    y = f32(SS_Y_D) * f1d_y + f32(SS_Y_JS) * js
    new_st = {"f2dt": f2dt, "f1s": f1s, "f1dt": f1dt, "f2s": f2s}
    return jnp.stack([w, x, y], axis=1), new_st


# --- UHJ output encoding (UhjEncoderIIR::encode, uhjfilter.cpp:231-277) ------

ENC_IIR_S_W, ENC_IIR_S_X = 0.4698463, 0.0757602682546
ENC_IIR_D_W, ENC_IIR_D_X = -0.17101005, 0.208149636675
ENC_IIR_D_Y = 0.267586995182


def uhj_encoder_iir_state() -> dict:
    return {
        "enc_f1wx": jnp.zeros((1, 4, 2), jnp.float32),
        "enc_f2wx": jnp.zeros((1, 4, 2), jnp.float32),
        "enc_f1y": jnp.zeros((1, 4, 2), jnp.float32),
        "enc_dwx": jnp.zeros(1, jnp.float32),
        "enc_dy": jnp.zeros(1, jnp.float32),
    }


def uhj_encode_iir(w: jax.Array, x: jax.Array, y: jax.Array, st: dict,
                   T: int):
    """FOA (W, X, Y) [T] -> (left, right, st') — the default IIR tier.

    The S and Y filter1 paths are delayed one sample relative to the
    filter2 (j) path, exactly the mDelayWX/mDelayY alignment of
    uhjfilter.cpp:244/253; the direct-output term is zero here (the dry
    bus carries everything — no real-out prefill in this renderer).
    """
    s_f, f1wx = _allpass4((f32(ENC_IIR_S_W) * w
                           + f32(ENC_IIR_S_X) * x)[None],
                          st["enc_f1wx"], FILTER1_COEFF)
    s = jnp.concatenate([st["enc_dwx"], s_f[0][:T - 1]])
    jwx, f2wx = _allpass4((f32(ENC_IIR_D_W) * w
                           + f32(ENC_IIR_D_X) * x)[None],
                          st["enc_f2wx"], FILTER2_COEFF)
    y_f, f1y = _allpass4(y[None], st["enc_f1y"], FILTER1_COEFF)
    yd = jnp.concatenate([st["enc_dy"], y_f[0][:T - 1]])
    d = jwx[0] + f32(ENC_IIR_D_Y) * yd
    st2 = {"enc_f1wx": f1wx, "enc_f2wx": f2wx, "enc_f1y": f1y,
           "enc_dwx": s_f[0][T - 1:T], "enc_dy": y_f[0][T - 1:T]}
    return s + d, s - d, st2


# --- TSME output encoding (TsmeEncoderIIR::encode, tsmefilter.cpp:280-329) ---

TSME_S_W, TSME_S_X, TSME_S_Z = 0.288397341271, 0.166565447888, 0.187684284734
TSME_D_W, TSME_D_X = 0.444008050325, -0.256439256487
TSME_D_Y = 0.333238912931


def tsme_encoder_iir_state() -> dict:
    return {
        "tsme_f1wxz": jnp.zeros((1, 4, 2), jnp.float32),
        "tsme_f2wx": jnp.zeros((1, 4, 2), jnp.float32),
        "tsme_f1y": jnp.zeros((1, 4, 2), jnp.float32),
        "tsme_dwxz": jnp.zeros(1, jnp.float32),
        "tsme_dy": jnp.zeros(1, jnp.float32),
    }


def tsme_encode_iir(w: jax.Array, y: jax.Array, z: jax.Array, x: jax.Array,
                    st: dict, T: int):
    """FOA ACN (W, Y, Z, X) [T] -> (left, right, st').

    Tetraphonic surround matrix encoding: like the UHJ encoder but with
    the height (Z) folded into the S sum; same one-sample filter1-path
    delay alignment (tsmefilter.cpp:296/305)."""
    s_f, f1wxz = _allpass4((f32(TSME_S_W) * w + f32(TSME_S_X) * x
                            + f32(TSME_S_Z) * z)[None],
                           st["tsme_f1wxz"], FILTER1_COEFF)
    s = jnp.concatenate([st["tsme_dwxz"], s_f[0][:T - 1]])
    jwx, f2wx = _allpass4((f32(TSME_D_W) * w
                           + f32(TSME_D_X) * x)[None],
                          st["tsme_f2wx"], FILTER2_COEFF)
    y_f, f1y = _allpass4(y[None], st["tsme_f1y"], FILTER1_COEFF)
    yd = jnp.concatenate([st["tsme_dy"], y_f[0][:T - 1]])
    d = jwx[0] + f32(TSME_D_Y) * yd
    st2 = {"tsme_f1wxz": f1wxz, "tsme_f2wx": f2wx, "tsme_f1y": f1y,
           "tsme_dwxz": s_f[0][T - 1:T], "tsme_dy": y_f[0][T - 1:T]}
    return s + d, s - d, st2
