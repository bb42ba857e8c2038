"""EAXReverb / Reverb effect engine (alc/effects/reverb.cpp).

The reference is a 4-line feedback delay network: a main input delay feeds
early reflections (decorrelating taps -> band filters -> 4-line all-pass ->
geometric reflection into an echo delay), whose scattered output feeds the
late reverb (modulated feedback delays -> T60 damping -> input taps ->
Gerzon vector all-pass -> FDN scatter re-feed).  Two complete pipelines
exist; "full" parameter updates switch to the spare pipeline and cross-fade
the old one out over the reverb's own decay span (reverb.cpp:1266-1271).

TPU-native realization:
  * All delay lines are power-of-two ring tensors carried in the device
    state pytree, sharing one global sample offset (like the reference's
    mOffset), read/written with two-piece dynamic slices - no gathers except
    the (tiny, [4 x chunk]) modulated late-feedback read.
  * The block is processed in CHUNK-sample sub-chunks via lax.scan (the
    reference's MAX_UPDATE_SAMPLES=256 loop).  All feedback lags are
    >= CHUNK by construction (late line lengths) except the all-pass
    recurrences, which are solved by fixed-point iteration: the tap stream
    depends on this chunk's writes only at lags >= the all-pass offset, so
    ceil(CHUNK/min_offset) passes reproduce the sequential result exactly
    (min_offset is the density=1 lower bound, so the static pass count
    always suffices; extra passes are idempotent at the fixed point).
  * The 256-phase cubic modulation filter (core/cubic_tables.h CubicFilter)
    is precomputed in float64 and applied with a small take_along gather.
  * Parameter-change crossfades (delay taps, the early coeff) key off an
    update serial carried in state, matching the first-256-sample fade of
    the reference.

Property names follow EFX in snake_case; defaults are the AL_EAXREVERB
defaults (include/AL/efx.h:317-401).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..core import ambidefs, panning
from ..ops import spec
from ..ops.filters import _biquad_chunked_single
from .base import EffectState, effect_mix, register

f32 = np.float32

MAX_UPDATE_SAMPLES = 256
NUM_LINES = 4
MOD_FRACBITS = 24
MOD_FRACONE = 1 << MOD_FRACBITS
MODULATION_DEPTH_COEFF = 0.05
DEFAULT_MOD_TIME = 0.25
MAX_MOD_TIME = 4.0
DENSITY_SCALE = 1000.0
INV_SQRT2 = float(1.0 / np.sqrt(2.0))
SQRT3 = float(np.sqrt(3.0))
REVERB_DECAY_GAIN = 0.001            # core/effects/base.h:21 (-60 dB)
MAX_REFLECTIONS_DELAY = 0.3
MAX_LATE_DELAY = 0.1

B2A = np.array([                     # reverb.cpp:88 (W Y Z X -> A0..A3)
    [0.5,  0.5,  0.5,  0.5],
    [0.5, -0.5, -0.5,  0.5],
    [0.5,  0.5, -0.5, -0.5],
    [0.5, -0.5,  0.5, -0.5]], f32)
EARLY_A2B = np.array([               # reverb.cpp:99
    [0.5,  0.5,  0.5,  0.5],
    [0.5, -0.5,  0.5, -0.5],
    [0.5, -0.5, -0.5,  0.5],
    [0.5,  0.5, -0.5, -0.5]], f32)
LATE_A2B = np.array([                # reverb.cpp:113
    [0.5, 0.5, 0.5, 0.5],
    [INV_SQRT2, -INV_SQRT2, 0.0, 0.0],
    [0.0, 0.0, -INV_SQRT2, INV_SQRT2],
    [0.5, 0.5, -0.5, -0.5]], f32)
# Geometric reflection (DelayLineU::writeReflected, reverb.cpp:323-343).
REFLECT = (np.full((4, 4), -0.5, f32) + np.eye(4, dtype=f32))

EARLY_TAP_LENGTHS = np.array([0.0, 1.010676e-3, 2.126553e-3, 3.358580e-3])
EARLY_ALLPASS_LENGTHS = np.array([4.854840e-4, 5.360178e-4, 5.918117e-4,
                                  6.534130e-4])
EARLY_LINE_LENGTHS = np.array([2.992520e-3, 5.456575e-3, 7.688329e-3,
                               9.709681e-3])
LATE_ALLPASS_LENGTHS = np.array([8.091400e-4, 1.019453e-3, 1.407968e-3,
                                 1.618280e-3])
LATE_LINE_LENGTHS = np.array([9.709681e-3, 1.223343e-2, 1.689561e-2,
                              1.941936e-2])

DEFAULTS = {
    "density": 1.0, "diffusion": 1.0, "gain": 0.32, "gain_hf": 0.89,
    "gain_lf": 1.0, "decay_time": 1.49, "decay_hf_ratio": 0.83,
    "decay_lf_ratio": 1.0, "reflections_gain": 0.05,
    "reflections_delay": 0.007, "reflections_pan": (0.0, 0.0, 0.0),
    "late_reverb_gain": 1.26, "late_reverb_delay": 0.011,
    "late_reverb_pan": (0.0, 0.0, 0.0), "echo_time": 0.25, "echo_depth": 0.0,
    "modulation_time": 0.25, "modulation_depth": 0.0,
    "air_absorption_gain_hf": 0.994, "hf_reference": 5000.0,
    "lf_reference": 250.0, "room_rolloff_factor": 0.0,
    "decay_hf_limit": True,
}


def _reverb_boost() -> float:
    """`[reverb] boost` config key: reverb output gain adjust in dB
    (alc/alc.cpp:615-624; ReverbBoost)."""
    from ..alc import config as alconf

    db = alconf.config_value_float("reverb", "boost", 0.0) or 0.0
    return float(10.0 ** (db / 20.0)) if db else 1.0


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def _cubic_filter_table() -> np.ndarray:
    """gCubicTable (core/cubic_tables.cpp:109-128): [256, 4] f32 coeffs."""
    steps = 256

    def get_coeff(idx):
        k = 0.5 + idx
        if k > 512.0:
            return 0.0
        s = np.sin(np.pi * 1.280 / 1024.0 * k)
        t = (np.cos(np.pi * 2.000 / 1023.0 * k) - 1.0) * 0.50
        u = (np.cos(np.pi * 4.000 / 1023.0 * k) - 1.0) * 0.08
        return s * (t + u + 1.0) / k

    filt = np.zeros(steps * 2 + 1)
    scale_idx = 512.0 / (steps * 2)
    for i in range(steps // 2 + 1):
        c0 = get_coeff((steps + i) * scale_idx)
        c1 = get_coeff(i * scale_idx)
        c2 = get_coeff((steps - i) * scale_idx)
        c3 = get_coeff((steps * 2 - i) * scale_idx)
        s = 1.0 / (c0 + c1 + c2 + c3)
        filt[steps + i] = np.float32(c0 * s)
        filt[i] = np.float32(c1 * s)
        filt[steps - i] = np.float32(c2 * s)
        filt[steps * 2 - i] = np.float32(c3 * s)
    filt = filt.astype(f32)
    i = np.arange(steps)
    return np.stack([filt[steps + i], filt[i], filt[steps - i],
                     filt[steps * 2 - i]], axis=1)


_CUBIC_TAB = _cubic_filter_table()

# Tap-major packing for the Pallas kernel's lane gathers:
# _CUBIC_TAB8[tap*2 + (frac>>7), frac & 127] = _CUBIC_TAB[frac, tap].
_CUBIC_TAB8 = np.stack([_CUBIC_TAB[h * 128:(h + 1) * 128, t]
                        for t in range(4) for h in (0, 1)]).astype(f32)


def _calc_delay_mult(density: float) -> f32:
    return f32(max(1.0, np.cbrt(f32(density * DENSITY_SCALE))))


def _decay_coeff(length, decay_time) -> f32:
    return f32(np.power(f32(REVERB_DECAY_GAIN), f32(length / decay_time)))


def _shelf(kind: str, f0norm, gain) -> np.ndarray:
    """setParamsFromSlope with slope 1 (biquad.h:92-97)."""
    gain = f32(max(gain, 0.001))
    rcpq = f32(np.sqrt(f32((gain + 1.0 / gain) * (1.0 / 1.0 - 1.0) + 2.0)))
    return spec.biquad_set_params(kind, f32(f0norm), gain, rcpq)


def _transform_from_vector(vec) -> np.ndarray:
    """GetTransformFromVector (reverb.cpp:1099-1136), transposed layout."""
    norm = np.array(vec, f32)
    mag = f32(np.sqrt(f32(np.dot(norm, norm))))
    if mag > 1.0:
        scale = f32(SQRT3 / mag)
        norm = norm * np.array([-scale, scale, scale], f32)
        mag = f32(1.0)
    else:
        norm = norm * np.array([-SQRT3, SQRT3, SQRT3], f32)
    return np.array([
        [1.0, norm[0], norm[1], norm[2]],
        [0.0, 1.0 - mag, 0.0, 0.0],
        [0.0, 0.0, 1.0 - mag, 0.0],
        [0.0, 0.0, 0.0, 1.0 - mag]], f32)


def _ring_read(buf, offset, lag, T: int):
    """[4, T] window at (offset - lag); lag traced, length pow2."""
    length = buf.shape[1]
    ext = jnp.concatenate([buf, buf[:, :T]], axis=1)
    start = ((offset - lag) % length).astype(jnp.int32)
    return jax.vmap(lambda row: jax.lax.dynamic_slice(row, (start,), (T,)))(ext)


def _ring_read_win(buf, offset, lag, T: int, W: int):
    """[4, W] window at (offset - lag), W >= T (for modulated reads)."""
    length = buf.shape[1]
    ext = jnp.concatenate([buf, buf[:, :W]], axis=1)
    start = ((offset - lag) % length).astype(jnp.int32)
    return jax.vmap(lambda row: jax.lax.dynamic_slice(row, (start,), (W,)))(ext)


def _ring_write(buf, offset, values, T: int):
    length = buf.shape[1]
    off = (offset % length).astype(jnp.int32)
    # length is pow2 >= 2*T for every line, and offset advances by T, so a
    # write never wraps mid-chunk when offset % T == 0 (guaranteed: all ring
    # lengths are multiples of the chunk size).
    return jax.vmap(lambda row, v: jax.lax.dynamic_update_slice(row, v, (off,))
                    )(buf, values)


def _shift_right(x, lag, T: int):
    """[4, T] rows delayed by traced lag with zero fill."""
    ext = jnp.concatenate([jnp.zeros_like(x), x], axis=1)
    start = jnp.clip(T - lag, 0, T).astype(jnp.int32)
    return jax.vmap(lambda row: jax.lax.dynamic_slice(row, (start,), (T,)))(ext)


def _shift_right_rows(x, lags, T: int):
    """Per-row traced lags."""
    ext = jnp.concatenate([jnp.zeros_like(x), x], axis=1)
    starts = jnp.clip(T - lags, 0, T).astype(jnp.int32)
    return jax.vmap(lambda row, s: jax.lax.dynamic_slice(row, (s,), (T,))
                    )(ext, starts)


def _scatter(x, mix_x, mix_y):
    """VectorPartialScatter (reverb.cpp:1385-1394) over [4, T]."""
    s0, s1, s2, s3 = x[0], x[1], x[2], x[3]
    return jnp.stack([
        mix_x * s0 + mix_y * (s1 - s2 + s3),
        mix_x * s1 + mix_y * (-s0 + s2 + s3),
        mix_x * s2 + mix_y * (s0 - s1 + s3),
        mix_x * s3 + mix_y * (-s0 - s1 - s2)])


def _const_biquad(x, z, coeffs, chunk: int = 32):
    """Constant-coefficient biquad over [4, T] via the chunked kernel."""
    T = x.shape[1]
    cf = jnp.broadcast_to(coeffs[None], (T // chunk,) + coeffs.shape)
    return _biquad_chunked_single(x, z, cf, chunk)


@register("eaxreverb")
class ReverbEffect(EffectState):
    defaults = DEFAULTS

    def __init__(self, device) -> None:
        super().__init__(device)
        freq = device.sample_rate
        self.freq = f32(freq)
        # Static chunk size: must not exceed the shortest possible late
        # feedback lag (LATE_LINE_LENGTHS[0] at density_mult=1).
        ch = 64
        while ch * 2 <= min(MAX_UPDATE_SAMPLES,
                            int(LATE_LINE_LENGTHS[0] * freq + 0.5) - 1):
            ch *= 2
        self.chunk = ch
        self.granularity = ch   # dispatch block sizes must chunk evenly
        # Static fixed-point pass counts from the density_mult=1 lower
        # bounds of the all-pass lags.
        self.early_ap_passes = -(-ch // max(int(EARLY_ALLPASS_LENGTHS[0] * freq), 1))
        self.late_ap_passes = -(-ch // max(int(LATE_ALLPASS_LENGTHS[0] * freq), 1))
        self.mod_win = int(freq / 160.0) + 8   # max (idelay>>8) + cubic taps

        mult = _calc_delay_mult(1.0)
        late_diff_avg = (LATE_LINE_LENGTHS[-1] - LATE_LINE_LENGTHS[0]) / NUM_LINES
        max_mod_delay = MAX_MOD_TIME * MODULATION_DEPTH_COEFF / 2.0
        vecap_extra = int(np.ceil(LATE_ALLPASS_LENGTHS[0] * mult * freq))
        self.len_main = _next_pow2(int(np.ceil(
            (MAX_REFLECTIONS_DELAY + EARLY_TAP_LENGTHS[-1] * mult) * freq)) + 1024)
        self.len_late_in = _next_pow2(int(np.ceil(
            (MAX_LATE_DELAY + late_diff_avg * mult) * freq)) + 1024)
        self.len_early_ap = _next_pow2(int(np.ceil(
            EARLY_ALLPASS_LENGTHS[-1] * mult * freq)))
        self.len_early = _next_pow2(int(np.ceil(
            EARLY_LINE_LENGTHS[-1] * mult * freq)) + MAX_UPDATE_SAMPLES)
        self.len_vecap = _next_pow2(int(np.ceil(
            LATE_ALLPASS_LENGTHS[-1] * mult * freq)) + vecap_extra)
        self.len_late = _next_pow2(int(np.ceil(
            LATE_LINE_LENGTHS[-1] * mult * freq + max_mod_delay * freq)) + 4)
        # Ring lengths must be chunk multiples so chunk writes never wrap,
        # and at least MIRROR rows long so the Pallas kernel's mirrored-ring
        # staging (ops/pallas/reverb.py run_pipeline_pallas) never truncates
        # its wrap-free read window.  Ring-modulo semantics are length-
        # agnostic above the required minimum, so the floor is harmless for
        # the jnp path.
        for name in ("len_main", "len_late_in", "len_early_ap", "len_early",
                     "len_vecap", "len_late"):
            setattr(self, name, max(getattr(self, name), 2 * self.chunk,
                                    1024))

        self.upmix = device.layout.ambi_order > 1
        if self.upmix:
            self.order_scales = ambidefs.hf_order_scales(
                1, device.layout.ambi_order, horizontal_only=False)
            self.first_order_up = ambidefs.first_order_up()
        self._splitter_coeff = None

        # Host-side previous values for tap crossfades + pipeline swap.
        self._serial = 0
        self._params = None       # previous full-update key
        self._prev = None         # previous pipeline params (dict)
        self._old_params = None   # fading old-pipeline params
        self._fade_blocks = 0     # blocks left of old-pipeline fade
        self._old_active = False

    # -- host half -----------------------------------------------------------

    def state_signature(self):
        return ("eaxreverb", self.chunk, self._old_active, self.upmix)

    def horizon_blocks(self) -> int:
        if self._old_active:
            return max(self._fade_blocks, 1)
        return 1 << 30

    def advance(self, frames: int) -> None:
        """Host mirror of the old-pipeline fade countdown."""
        if not self._old_active:
            return
        blocks = frames // 1024 if frames >= 1024 else 1
        was = self._fade_blocks
        self._fade_blocks -= blocks
        if was > 0 >= self._fade_blocks:
            self.device.mark_config_dirty()
        if self._fade_blocks <= -1:
            # Old pipeline fully faded and its last silent block rendered:
            # zero its delay state and drop it from the graph.
            dev = self.device
            slot_state = dev._state.get(f"slot{self._slot_index}")
            if slot_state is not None:
                slot_state["B"] = jax.tree.map(jnp.zeros_like, slot_state["B"])
            self._old_active = False
            self._old_params = None
            dev.mark_config_dirty()

    def _pipeline_state(self) -> dict:
        # One distinct buffer per leaf: the render step donates the state
        # pytree, and a buffer shared by several donated leaves is an
        # invalid double-donation.
        z4 = lambda: jnp.zeros((NUM_LINES, 2), jnp.float32)
        st = {
            "late_in": jnp.zeros((NUM_LINES, self.len_late_in), jnp.float32),
            "early_ap": jnp.zeros((NUM_LINES, self.len_early_ap), jnp.float32),
            "early_dl": jnp.zeros((NUM_LINES, self.len_early), jnp.float32),
            "vecap": jnp.zeros((NUM_LINES, self.len_vecap), jnp.float32),
            "late_dl": jnp.zeros((NUM_LINES, self.len_late), jnp.float32),
            "lp_z": z4(), "hp_z": z4(), "t60_hf_z": z4(), "t60_lf_z": z4(),
            "mod_index": jnp.zeros((), jnp.uint32),
            "serial_done": jnp.full((), -1, jnp.int32),
            "g_early_cur": jnp.zeros((NUM_LINES, self.device.n_dry), jnp.float32),
            "g_late_cur": jnp.zeros((NUM_LINES, self.device.n_dry), jnp.float32),
        }
        if self.upmix:
            st["split_early"] = jnp.zeros((NUM_LINES, 3), jnp.float32)
            st["split_late"] = jnp.zeros((NUM_LINES, 3), jnp.float32)
        return st

    def max_window(self) -> int:
        # The only full-window ring write is the main input line
        # (process(): _ring_write(main, offset, ain, T)); all other rings
        # write at CHUNK granularity inside the scans.  Power-of-two
        # windows up to len_main land on aligned offsets and never wrap.
        return self.len_main

    def device_update(self, buffer=None) -> dict:
        from ..ops import filters as f_ops

        self._splitter_coeff = float(f_ops.band_splitter_coeff(
            getattr(self.device.layout, "xover_f0norm", 400.0 / self.freq)))
        self._serial = 0
        self._params = None
        self._prev = None
        self._old_params = None
        self._old_active = False
        self._fade_blocks = 0
        return {
            "offset": jnp.zeros((), jnp.int32),
            "main": jnp.zeros((NUM_LINES, self.len_main), jnp.float32),
            "A": self._pipeline_state(),
            "B": self._pipeline_state(),
        }

    def update(self, slot, props) -> dict:
        self._slot_index = slot.index
        p = dict(DEFAULTS)
        p.update({k: v for k, v in props.items() if v is not None})
        freq = self.freq

        hf_ratio = f32(p["decay_hf_ratio"])
        if p["decay_hf_limit"] and p["air_absorption_gain_hf"] < 1.0:
            # CalcLimitedHfRatio (reverb.cpp:893-906)
            decay_len = f32(np.log10(f32(p["air_absorption_gain_hf"]))
                            * p["decay_time"] / -3.0)
            limit = f32(1.0 / 343.3 / decay_len)
            hf_ratio = f32(min(limit, hf_ratio))
        lf_decay = f32(np.clip(p["decay_time"] * p["decay_lf_ratio"], 0.1, 20.0))
        hf_decay = f32(np.clip(p["decay_time"] * hf_ratio, 0.1, 20.0))

        full_key = (p["density"], p["diffusion"], p["decay_time"],
                    float(hf_decay), float(lf_decay), p["modulation_time"],
                    p["modulation_depth"], p["hf_reference"],
                    p["lf_reference"])
        full_update = self._params != full_key
        if full_update and self._params is not None:
            # Pipeline switch: the spare becomes current.  Swap the state
            # subtrees host-side (pure relabeling between dispatches) so the
            # graph always processes pipeline "A" as current.
            dev = self.device
            st = dev._state.get(f"slot{slot.index}")
            if st is not None:
                st["A"], st["B"] = st["B"], st["A"]
            self._old_params = self._prev
            if self._old_params is not None:
                self._old_params = dict(self._old_params)
                self._old_params["early_coeff0"] = \
                    self._old_params["early_coeff1"]
                self._old_params["early_coeff1"] = np.float32(0.0)
            self._old_active = self._old_params is not None
            self._prev = None
        self._params = full_key
        self._serial += 1

        mult = _calc_delay_mult(p["density"])
        prev = self._prev

        # Delay taps (updateDelayLine, reverb.cpp:1063-1096)
        early_taps = np.array([int(f32((l * mult + p["reflections_delay"]) * freq))
                               for l in EARLY_TAP_LENGTHS], np.int32)
        late_taps = np.array([int(f32(((l - LATE_LINE_LENGTHS[0]) / NUM_LINES * mult
                                       + p["late_reverb_delay"]) * freq))
                              for l in LATE_LINE_LENGTHS], np.int32)
        early_coeff = f32(p["gain"])

        # Early lines (EarlyReflections::updateLines, reverb.cpp:927-950)
        e_ap_coeff = f32(p["diffusion"] ** 2 * INV_SQRT2)
        e_ap_off = np.array([int(f32(l * mult * freq))
                             for l in EARLY_ALLPASS_LENGTHS], np.int32)
        e_off = np.array([int(f32(l * mult * freq))
                          for l in EARLY_LINE_LENGTHS], np.int32)
        e_avg = float(np.sum(EARLY_LINE_LENGTHS) / NUM_LINES * mult)
        e_coeff = _decay_coeff(e_avg, p["decay_time"])

        # Modulation (reverb.cpp:956-988)
        mod_step = max(int(np.rint(f32(MOD_FRACONE / (freq * p["modulation_time"])))), 1)
        mt = (DEFAULT_MOD_TIME if p["modulation_time"] >= DEFAULT_MOD_TIME
              else p["modulation_time"])
        mod_depth = f32(MODULATION_DEPTH_COEFF / 4.0 * mt
                        * p["modulation_depth"] * freq)

        # Late lines (LateReverb::updateLines, reverb.cpp:992-1060)
        hf0 = f32(min(p["hf_reference"] / freq, 0.49))
        lf0 = f32(min(p["lf_reference"] / freq, 0.49))
        nwf = f32(freq / 20000.0)
        ap_avg = float(np.sum(LATE_ALLPASS_LENGTHS) / NUM_LINES)
        delay_avg = float(np.sum(LATE_LINE_LENGTHS) / NUM_LINES + ap_avg)
        decay_w = f32(lf0 * nwf * lf_decay + (hf0 - lf0) * nwf * p["decay_time"]
                      + (1.0 - hf0 * nwf) * hf_decay)
        a = _decay_coeff(delay_avg * mult, decay_w)
        density_gain = f32(np.sqrt(f32(1.0 - a * a)))
        l_ap_coeff = f32(p["diffusion"] ** 2 * INV_SQRT2)
        l_ap_off = np.array([int(f32(l * mult * freq))
                             for l in LATE_ALLPASS_LENGTHS], np.int32)
        l_off = np.array([max(int(f32(l * mult * freq + 0.5)), 1) - 1
                          for l in LATE_LINE_LENGTHS], np.int32)
        # T60 per line (lengths include diffusion-lerped all-pass + mod depth)
        mod_delay = float(mod_depth / freq)
        t60_mid = np.zeros(NUM_LINES, f32)
        t60_hf = np.zeros((NUM_LINES, 5), f32)
        t60_lf = np.zeros((NUM_LINES, 5), f32)
        for i in range(NUM_LINES):
            ln = f32((LATE_ALLPASS_LENGTHS[i] + (ap_avg - LATE_ALLPASS_LENGTHS[i])
                      * p["diffusion"]) * mult + mod_delay
                     + LATE_LINE_LENGTHS[i] * mult)
            mf = _decay_coeff(ln, p["decay_time"])
            lfg = f32(_decay_coeff(ln, lf_decay) / mf)
            hfg = f32(_decay_coeff(ln, hf_decay) / mf)
            t60_mid[i] = mf
            t60_lf[i] = _shelf("lowshelf", lf0, lfg)
            t60_hf[i] = _shelf("highshelf", hf0, hfg)

        # Scattering coefficients (CalcMatrixCoeffs, reverb.cpp:879-890)
        t = f32(p["diffusion"] * np.arctan(SQRT3))
        mix_x, mix_y = f32(np.cos(t)), f32(np.sin(t) / SQRT3)

        # Master filters
        lp = _shelf("highshelf", hf0, p["gain_hf"])
        hp = _shelf("lowshelf", lf0, p["gain_lf"])

        # 3D panning (update3DPanning, reverb.cpp:1139-1207)
        gain = f32(slot.gain * _reverb_boost())  # [reverb] boost config key
        g_early, g_late = self._pan_gains(
            p["reflections_pan"], p["late_reverb_pan"],
            f32(p["reflections_gain"] * gain), f32(p["late_reverb_gain"] * gain))

        # Old-pipeline fade span (reverb.cpp:1288-1310)
        decay_base = f32(slot.gain * p["gain"] * p["late_reverb_gain"])
        decay_diff = f32(REVERB_DECAY_GAIN / max(decay_base, REVERB_DECAY_GAIN))
        diff_time = (0.0 if not decay_diff < 1.0
                     else float(np.log10(decay_diff) * (20.0 / -60.0)
                                * p["decay_time"]))
        decay_samples = (p["reflections_delay"] + p["late_reverb_delay"]
                         + diff_time) * freq
        fade_samples = int(min(decay_samples, 100000.0))
        if full_update:
            self._fade_blocks = -(-fade_samples // 1024)

        # First update after a device reset: the reference's tap/coeff
        # "previous" values are zero (fresh pipeline), so the first block
        # fades the early feed and late input in from silence.
        cur = {
            "serial": np.int32(self._serial),
            "early_taps0": (prev or {}).get(
                "early_taps1", np.zeros(NUM_LINES, np.int32)),
            "early_taps1": early_taps,
            "early_coeff0": (prev or {}).get("early_coeff1", np.float32(0.0)),
            "early_coeff1": early_coeff,
            "late_taps0": (prev or {}).get(
                "late_taps1", np.zeros(NUM_LINES, np.int32)),
            "late_taps1": late_taps,
            "density_gain": density_gain,
            "e_ap_coeff": e_ap_coeff, "e_ap_off": e_ap_off,
            "e_off": e_off, "e_coeff": e_coeff,
            "l_ap_coeff": l_ap_coeff, "l_ap_off": l_ap_off, "l_off": l_off,
            "t60_mid": t60_mid, "t60_hf": t60_hf, "t60_lf": t60_lf,
            "mod_step": np.uint32(mod_step), "mod_depth": mod_depth,
            "mix_x": mix_x, "mix_y": mix_y,
            "lp": lp, "hp": hp,
            "g_early": g_early, "g_late": g_late,
        }
        self._prev = cur

        out = {k: np.asarray(v) for k, v in cur.items()}
        if self._old_active:
            for k, v in self._old_params.items():
                if k != "serial":
                    out[f"old_{k}"] = np.asarray(v)
            if self._fade_blocks <= 0:
                out["old_g_early"] = np.zeros_like(g_early)
                out["old_g_late"] = np.zeros_like(g_late)
        return out

    def _pan_gains(self, refl_pan, late_pan, early_gain, late_gain):
        earlymat = _transform_from_vector(refl_pan)
        latemat = _transform_from_vector(late_pan)
        layout = self.device.layout

        def coeffs_for(a2b, mat):
            res = np.zeros((NUM_LINES, 16), f32)
            if self.upmix:
                up = self.first_order_up            # [4, n_up]
                for i in range(4):
                    for j in range(4):
                        res[i, :up.shape[1]] += mat[i][j] * up[j]
            else:
                for i in range(4):
                    for j in range(4):
                        res[i, :4] += a2b[j][i] * mat[j]
            return res

        def pan(rows, gain):
            out = np.zeros((NUM_LINES, self.device.n_dry), f32)
            for i in range(NUM_LINES):
                out[i] = panning.compute_pan_gains(
                    layout.dry_acn, layout.dry_scale, rows[i], gain)
            return out

        return (pan(coeffs_for(EARLY_A2B, earlymat), early_gain),
                pan(coeffs_for(LATE_A2B, latemat), late_gain))

    # -- device half ----------------------------------------------------------

    def _pallas_eligible(self, T: int) -> bool:
        """Whole-pipeline Pallas kernel (ops/pallas/reverb.py): TPU device,
        the standard 256-sample chunk, no A/B crossfade in flight, and a
        wide window — the kernel's fixed cost (ring staging + dispatch)
        amortizes past ~16 chunks (measured: 0.063 ms/1024-block at
        W=16384 vs the jnp pipeline's 0.662; the jnp path wins below
        ~4096, tools/bench_reverb.py)."""
        from ..ops.pallas import reverb as rev_pallas

        return (getattr(self.device, "_pallas_ok", False)
                and getattr(self.device, "_pallas_reverb", True)
                and self.chunk == rev_pallas.CH and T % self.chunk == 0
                and T >= 4096 and not self._old_active)

    def process(self, state: dict, params: dict, wet: jax.Array, T: int):
        b2a = jnp.asarray(B2A)
        ain = jnp.einsum("cd,dt->ct", b2a, wet[:NUM_LINES],
                         precision=jax.lax.Precision.HIGHEST)

        offset0 = state["offset"]
        if self._pallas_eligible(T):
            return self._process_pallas(state, params, ain, offset0, T)
        main = _ring_write(state["main"], offset0, ain, T)

        pA, earlyA, lateA = self._run_pipeline(
            state["A"], params, main, offset0, T, prefix="")
        outs = [(earlyA, pA.pop("_ge"), state["A"]["g_early_cur"]),
                (lateA, pA.pop("_gl"), state["A"]["g_late_cur"])]
        pA_new = pA

        new_state = {"offset": (offset0 + T) % (1 << 30), "main": main,
                     "A": pA_new, "B": state["B"]}

        if self._old_active:
            pB, earlyB, lateB = self._run_pipeline(
                state["B"], params, main, offset0, T, prefix="old_")
            outs.append((earlyB, pB.pop("_ge"), state["B"]["g_early_cur"]))
            outs.append((lateB, pB.pop("_gl"), state["B"]["g_late_cur"]))
            new_state["B"] = pB

        # mixOut: full-block gain ramps into the dry bus.
        taps = jnp.concatenate([jnp.concatenate([e, l], axis=0)
                                for (e, _, _), (l, _, _) in
                                zip(outs[0::2], outs[1::2])], axis=0)
        tgt = jnp.concatenate([g for _, g, _ in outs], axis=0)
        cur = jnp.concatenate([c for _, _, c in outs], axis=0)
        contrib, new_cur = effect_mix(taps, cur, tgt, T)
        n = NUM_LINES
        new_state["A"]["g_early_cur"] = new_cur[:n]
        new_state["A"]["g_late_cur"] = new_cur[n:2 * n]
        if self._old_active:
            new_state["B"]["g_early_cur"] = new_cur[2 * n:3 * n]
            new_state["B"]["g_late_cur"] = new_cur[3 * n:]
        return contrib, None, new_state

    def _process_pallas(self, state: dict, params: dict, ain, offset0,
                        T: int):
        """process() via the whole-pipeline Pallas kernel (single active
        pipeline; the kernel also performs the main-line input write)."""
        from ..ops.pallas import reverb as rev_pallas

        g = lambda k: jnp.asarray(params[k])
        pst = state["A"]
        serial = jnp.asarray(params["serial"])
        do_fade0 = pst["serial_done"] != serial

        def bc4(x):
            return jnp.broadcast_to(jnp.asarray(x, jnp.float32).reshape(-1),
                                    (NUM_LINES,))

        params_i = jnp.concatenate([
            g("early_taps0").astype(jnp.int32),
            g("early_taps1").astype(jnp.int32),
            g("late_taps0").astype(jnp.int32),
            g("late_taps1").astype(jnp.int32),
            g("e_ap_off").astype(jnp.int32),
            g("e_off").astype(jnp.int32),
            g("l_ap_off").astype(jnp.int32),
            g("l_off").astype(jnp.int32),
            g("mod_step").astype(jnp.int32).reshape(1),
        ])
        params_f = jnp.concatenate([
            bc4(g("early_coeff0")), bc4(g("early_coeff1")),
            bc4(g("e_coeff")), bc4(g("t60_mid")), bc4(g("density_gain")),
            jnp.stack([g("e_ap_coeff"), g("l_ap_coeff"), g("mix_x"),
                       g("mix_y"), g("mod_depth")]).astype(jnp.float32),
            jnp.zeros(7, jnp.float32),
        ])
        cf = jnp.zeros((16, 128), jnp.float32)
        cf = cf.at[0:4, 0:5].set(jnp.broadcast_to(g("lp"), (NUM_LINES, 5)))
        cf = cf.at[4:8, 0:5].set(jnp.broadcast_to(g("hp"), (NUM_LINES, 5)))
        cf = cf.at[8:12, 0:5].set(jnp.broadcast_to(g("t60_hf"),
                                                   (NUM_LINES, 5)))
        cf = cf.at[12:16, 0:5].set(jnp.broadcast_to(g("t60_lf"),
                                                    (NUM_LINES, 5)))

        st_in = dict(pst)
        st_in["main"] = state["main"]
        early, late, st2 = rev_pallas.run_pipeline_pallas(
            ain, st_in, params_i, params_f, cf, jnp.asarray(_CUBIC_TAB8),
            offset0, pst["mod_index"], do_fade0, T,
            mod_win=self.mod_win, e_passes=self.early_ap_passes,
            l_passes=self.late_ap_passes)
        main2 = st2.pop("main")
        st2["mod_index"] = (pst["mod_index"].astype(jnp.uint32)
                            + jnp.uint32(T)
                            * g("mod_step").astype(jnp.uint32))
        st2["serial_done"] = jnp.where(do_fade0, serial,
                                       pst["serial_done"])

        ge, gl = g("g_early"), g("g_late")
        if self.upmix:
            from ..ops import filters as f_ops
            a2b_e = jnp.asarray(EARLY_A2B)
            a2b_l = jnp.asarray(LATE_A2B)
            hfs = jnp.asarray(np.array(
                [self.order_scales[0]] + [self.order_scales[1]] * 3, f32))
            be = jnp.einsum("cj,jt->ct", a2b_e, early,
                            precision=jax.lax.Precision.HIGHEST)
            bl = jnp.einsum("cj,jt->ct", a2b_l, late,
                            precision=jax.lax.Precision.HIGHEST)
            be, se = f_ops.band_split_hf_scale(
                be, st2["split_early"], jnp.float32(self._splitter_coeff),
                hfs)
            bl, sl = f_ops.band_split_hf_scale(
                bl, st2["split_late"], jnp.float32(self._splitter_coeff),
                hfs)
            st2["split_early"], st2["split_late"] = se, sl
            early, late = be, bl

        new_state = {"offset": (offset0 + T) % (1 << 30), "main": main2,
                     "A": st2, "B": state["B"]}
        taps = jnp.concatenate([early, late], axis=0)
        tgt = jnp.concatenate([ge, gl], axis=0)
        cur = jnp.concatenate([pst["g_early_cur"], pst["g_late_cur"]],
                              axis=0)
        contrib, new_cur = effect_mix(taps, cur, tgt, T)
        n = NUM_LINES
        new_state["A"]["g_early_cur"] = new_cur[:n]
        new_state["A"]["g_late_cur"] = new_cur[n:2 * n]
        return contrib, None, new_state

    def _run_pipeline(self, pst: dict, params: dict, main, offset0, T: int,
                      prefix: str, debug: bool = False):
        """One ReverbPipeline over a block; returns (state', early, late)."""
        CH = self.chunk
        g = lambda k: jnp.asarray(params[prefix + k])
        serial = jnp.asarray(params["serial"])

        et0, et1 = g("early_taps0"), g("early_taps1")
        ec0, ec1 = g("early_coeff0"), g("early_coeff1")
        lt0, lt1 = g("late_taps0"), g("late_taps1")
        lp_cf, hp_cf = g("lp"), g("hp")
        e_ap_off, e_off = g("e_ap_off"), g("e_off")
        l_ap_off, l_off = g("l_ap_off"), g("l_off")
        t60_mid = g("t60_mid")
        t60_hf, t60_lf = g("t60_hf"), g("t60_lf")
        mix_x, mix_y = g("mix_x"), g("mix_y")
        e_ap_coeff, l_ap_coeff = g("e_ap_coeff"), g("l_ap_coeff")
        density_gain = g("density_gain")
        mod_step, mod_depth = g("mod_step"), g("mod_depth")

        do_fade0 = pst["serial_done"] != serial
        i_ch = jnp.arange(CH, dtype=jnp.float32)
        fade_step = jnp.float32(1.0 / CH)
        cubic_tab = jnp.asarray(_CUBIC_TAB)
        n_chunks = T // CH

        def early_chunk(carry, k):
            st, off = carry
            fade_now = do_fade0 & (k == 0)
            tap0 = jnp.where(fade_now, et0, et1)
            c0 = jnp.where(fade_now, ec0, ec1)
            # Two decorrelated taps with an in-chunk crossfade.
            w0 = jax.vmap(lambda l, tp: jax.lax.dynamic_slice(
                jnp.concatenate([l, l[:CH]]), (((off - tp) % main.shape[1]),), (CH,)))(
                    main, tap0)
            w1 = jax.vmap(lambda l, tp: jax.lax.dynamic_slice(
                jnp.concatenate([l, l[:CH]]), (((off - tp) % main.shape[1]),), (CH,)))(
                    main, et1)
            fadec = fade_step * i_ch
            tmp = w0 * c0 * (1.0 - fadec) + w1 * ec1 * fadec
            tmp0_dbg = tmp

            # Master band filters (dual biquad, constant coeffs).
            y0, lp_z = _const_biquad(tmp, st["lp_z"], jnp.broadcast_to(
                lp_cf, (NUM_LINES, 5)))
            y1, hp_z = _const_biquad(y0, st["hp_z"], jnp.broadcast_to(
                hp_cf, (NUM_LINES, 5)))
            tmp = y1

            # Early all-pass (Allpass4::process) by fixed-point iteration.
            ring = st["early_ap"]
            win = jax.vmap(lambda l, tp: jax.lax.dynamic_slice(
                jnp.concatenate([l, l[:CH]]), (((off - tp) % ring.shape[1]),), (CH,)))(
                    ring, e_ap_off)
            lag = e_ap_off[:, None].astype(jnp.int32)
            idx = jnp.arange(CH, dtype=jnp.int32)[None, :]
            d_est = tmp
            for _ in range(self.early_ap_passes):
                back = _shift_right_rows(d_est, e_ap_off, CH)
                r = jnp.where(idx < lag, win, back)
                y = r - e_ap_coeff * tmp
                d_est = tmp + e_ap_coeff * y
            yap = win * 0.0
            back = _shift_right_rows(d_est, e_ap_off, CH)
            r = jnp.where(idx < lag, win, back)
            yap = r - e_ap_coeff * tmp
            early_ap = _ring_write(ring, off, d_est, CH)
            tmp = yap

            # Reflect into the early delay, then combine with delayed echo.
            refl = jnp.einsum("ij,jt->it", jnp.asarray(REFLECT), tmp,
                              precision=jax.lax.Precision.HIGHEST)
            early_dl = _ring_write(st["early_dl"], off, refl, CH)
            ewin = jax.vmap(lambda l, tp: jax.lax.dynamic_slice(
                jnp.concatenate([l, l[:CH]]), (((off - tp) % early_dl.shape[1]),), (CH,)))(
                    early_dl, e_off)
            # e_off may be < CH: positions i >= e_off read this chunk's write.
            back = _shift_right_rows(refl, e_off, CH)
            dread = jnp.where(idx < e_off[:, None], ewin, back)
            early_out = dread * g("e_coeff") + tmp

            # Scatter into the late-reverb input delay.
            sc = _scatter(tmp, mix_x, mix_y)
            late_in = _ring_write(st["late_in"], off, sc, CH)

            st = dict(st, lp_z=lp_z, hp_z=hp_z, early_ap=early_ap,
                      early_dl=early_dl, late_in=late_in)
            if debug:
                return (st, off + CH), (early_out, {
                    "taps": tmp0_dbg, "lp": y0, "hp": y1,
                    "eapd": d_est, "eap": yap, "refl": refl,
                    "dread": dread, "sc": sc})
            return (st, off + CH), early_out

        (pst1, _), early = jax.lax.scan(
            early_chunk, (dict(pst), offset0), jnp.arange(n_chunks))
        dbg_early = {}
        if debug:
            early, dbg_early = early
        early = jnp.transpose(early, (1, 0, 2)).reshape(NUM_LINES, T)

        def late_chunk(carry, k):
            st, off = carry
            fade_now = do_fade0 & (k == 0)

            # Modulated feedback delays (Modulation::calcDelays).
            iidx = st["mod_index"] + (jnp.arange(CH, dtype=jnp.uint32)
                                      * mod_step.astype(jnp.uint32))
            xm = (iidx & jnp.uint32(MOD_FRACONE - 1)).astype(jnp.float32) \
                * jnp.float32(1.0 / MOD_FRACONE)
            half = (iidx & jnp.uint32(MOD_FRACONE >> 1)) == 0
            lfo = jnp.where(half, (-16.0 * xm * xm) + (8.0 * xm),
                            (16.0 * xm * xm) - (24.0 * xm) + 8.0)
            idelay = ((lfo + 1.0) * (mod_depth * 256.0)).astype(jnp.uint32)
            mod_index = st["mod_index"] + jnp.uint32(CH) * mod_step.astype(jnp.uint32)

            # Feedback reads with per-sample cubic-interpolated delay.
            W = CH + self.mod_win
            base_lag = l_off + jnp.int32(self.mod_win)
            win = jax.vmap(lambda l, tp: jax.lax.dynamic_slice(
                jnp.concatenate([l, l[:W]]), (((off - tp) % st["late_dl"].shape[1]),), (W,)))(
                    st["late_dl"], base_lag)
            # window index of output i at integer delay d: mod_win + i - d
            ip = (idelay >> 8).astype(jnp.int32)
            frac = (idelay & 255).astype(jnp.int32)
            pos = jnp.arange(CH, dtype=jnp.int32)[None, :] - ip[None, :] \
                + jnp.int32(self.mod_win)
            ctab = cubic_tab[frac]                             # [CH, 4]
            acc = jnp.zeros((NUM_LINES, CH), jnp.float32)
            for tap in range(4):
                gathered = jnp.take_along_axis(win, jnp.clip(pos - tap, 0, W - 1),
                                               axis=1)
                acc = acc + gathered * ctab[None, :, tap]
            tmp = acc * t60_mid[:, None]
            mod_dbg = tmp

            # T60 damping (HF then LF shelf).
            yh, t60_hf_z = _biquad_chunked_single(
                tmp, st["t60_hf_z"], jnp.broadcast_to(
                    t60_hf[None], (CH // 32, NUM_LINES, 5)), 32)
            yl, t60_lf_z = _biquad_chunked_single(
                yh, st["t60_lf_z"], jnp.broadcast_to(
                    t60_lf[None], (CH // 32, NUM_LINES, 5)), 32)
            tmp = yl

            # Input taps from the late-input delay with density-gain fade.
            ltap0 = jnp.where(fade_now, lt0, lt1)
            w0 = jax.vmap(lambda l, tp: jax.lax.dynamic_slice(
                jnp.concatenate([l, l[:CH]]), (((off - tp) % st["late_in"].shape[1]),), (CH,)))(
                    st["late_in"], ltap0)
            w1 = jax.vmap(lambda l, tp: jax.lax.dynamic_slice(
                jnp.concatenate([l, l[:CH]]), (((off - tp) % st["late_in"].shape[1]),), (CH,)))(
                    st["late_in"], lt1)
            step = jnp.where(ltap0 != lt1, density_gain * fade_step, 0.0)
            fade0 = density_gain - step[:, None] * i_ch[None, :]
            fade1 = step[:, None] * i_ch[None, :]
            tmp = tmp + w0 * fade0 + w1 * fade1
            lin_dbg = tmp

            # Vector all-pass (VecAllpass::process) by fixed-point iteration.
            ring = st["vecap"]
            vwin = jax.vmap(lambda l, tp: jax.lax.dynamic_slice(
                jnp.concatenate([l, l[:CH]]), (((off - tp) % ring.shape[1]),), (CH,)))(
                    ring, l_ap_off)
            lag = l_ap_off[:, None].astype(jnp.int32)
            idx = jnp.arange(CH, dtype=jnp.int32)[None, :]
            d_est = tmp   # scattered write estimate
            for _ in range(self.late_ap_passes):
                back = _shift_right_rows(d_est, l_ap_off, CH)
                r = jnp.where(idx < lag, vwin, back)
                y = r - l_ap_coeff * tmp
                d_est = _scatter(tmp + l_ap_coeff * y, mix_x, mix_y)
            back = _shift_right_rows(d_est, l_ap_off, CH)
            r = jnp.where(idx < lag, vwin, back)
            yap = r - l_ap_coeff * tmp
            vecap = _ring_write(ring, off, d_est, CH)
            out = yap

            # Reverse, scatter, and refeed the late delay.
            rev = _scatter(out[::-1], mix_x, mix_y)
            late_dl = _ring_write(st["late_dl"], off, rev, CH)

            st = dict(st, mod_index=mod_index, t60_hf_z=t60_hf_z,
                      t60_lf_z=t60_lf_z, vecap=vecap, late_dl=late_dl)
            if debug:
                return (st, off + CH), (out, {
                    "mod": mod_dbg, "t60": yl, "lin": lin_dbg,
                    "vapd": d_est, "rev": rev})
            return (st, off + CH), out

        (pst2, _), late = jax.lax.scan(
            late_chunk, (pst1, offset0), jnp.arange(n_chunks))
        dbg_late = {}
        if debug:
            late, dbg_late = late
            self._dbg_stages = {**dbg_early, **dbg_late}
        late = jnp.transpose(late, (1, 0, 2)).reshape(NUM_LINES, T)

        pst2["serial_done"] = jnp.where(do_fade0, serial, pst2["serial_done"])

        ge, gl = g("g_early"), g("g_late")
        if self.upmix:
            from ..ops import filters as f_ops
            a2b_e = jnp.asarray(EARLY_A2B)
            a2b_l = jnp.asarray(LATE_A2B)
            hfs = jnp.asarray(np.array(
                [self.order_scales[0]] + [self.order_scales[1]] * 3, f32))
            be = jnp.einsum("cj,jt->ct", a2b_e, early,
                            precision=jax.lax.Precision.HIGHEST)
            bl = jnp.einsum("cj,jt->ct", a2b_l, late,
                            precision=jax.lax.Precision.HIGHEST)
            be, se = f_ops.band_split_hf_scale(
                be, pst2["split_early"], jnp.float32(self._splitter_coeff), hfs)
            bl, sl = f_ops.band_split_hf_scale(
                bl, pst2["split_late"], jnp.float32(self._splitter_coeff), hfs)
            pst2["split_early"], pst2["split_late"] = se, sl
            early, late = be, bl

        pst2["_ge"], pst2["_gl"] = ge, gl
        return pst2, early, late


@register("reverb")
class StdReverbEffect(ReverbEffect):
    """AL_EFFECT_REVERB: the standard-reverb subset of EAXReverb."""
    defaults = dict(DEFAULTS)
