"""Convolution reverb (alc/effects/convolution.cpp).

Partitioned FFT convolution of the wet W channel with a (multi-channel)
impulse-response buffer: the first 128 IR taps run as a zero-latency
time-domain FIR (one [128-out x 128-tap] MXU matmul per sub-block), the
remaining segments convolve in the frequency domain against a newest-first
ring of input-partition spectra (256-pt FFTs over 128-sample zero-padded
partitions), with the same segmentation as the reference
(ConvolveUpdateSize=256 / 128-sample partitions, convolution.cpp:152-153).
Filter spectra are prepared in float64 like the reference's double-precision
forward FFT (convolution.cpp:394-400).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..core import ambidefs, panning
from ..core.devformat import (CHAN_POS_MAPS, AmbiLayout, AmbiScaling, Channel,
                              FmtChannels, is_ambisonic, is_uhj)
from ..ops import filters as f_ops
from .base import EffectState, effect_mix, register

f32 = np.float32

SEG = 128           # ConvolveUpdateSamples
FFT = 256           # ConvolveUpdateSize

# First-order cap on ambisonic IRs (convolution.cpp:273 MaxConvolveAmbiOrder).
MAX_CONVOLVE_AMBI_ORDER = 1

_2D_FMTS = (FmtChannels.BFORMAT2D, FmtChannels.UHJ2, FmtChannels.UHJ3,
            FmtChannels.SUPER_STEREO)   # buffer_storage.h:27 Is2DAmbisonic

# Static index matrix for the time-domain FIR:
# out[i] = sum_k ir[k] * in[SEG + i - k], in = prev 128 ++ new 128.
_WIN_IDX = (SEG + np.arange(SEG)[:, None] - np.arange(SEG)[None, :])


@register("convolution")
class ConvolutionEffect(EffectState):
    defaults = {"buffer": None, "orient_at": (0.0, 0.0, -1.0),
                "orient_up": (0.0, 1.0, 0.0)}

    def __init__(self, device) -> None:
        super().__init__(device)
        self.n_chan = 0
        self.n_segs = 0
        self.fmt_channels = None
        self._fir = None           # [C, 128] f32, time order
        self._freq_filter = None   # [C, S, 129] complex64
        # Ambisonic IR metadata (convolution.cpp:294-297): UHJ IRs decode to
        # B-Format with FuMa ordering / N3D scaling; capped at first order.
        self.ambi_layout = AmbiLayout.FUMA
        self.ambi_scaling = AmbiScaling.FUMA
        self.ambi_order = 0
        # UpsampleMix (convolution.cpp:486-509): per-channel band-split
        # HF/LF scale before the pan when the IR's order is below the
        # device's (or the UHJ2 shelving when the device isn't UHJ-out).
        self._upsample = False
        self._hf_scale = np.ones(1, f32)    # [C]
        self._lf_scale = np.ones(1, f32)    # [C]
        self._splitter_k = f_ops.BandSplitterKernels(
            float(f_ops.band_splitter_coeff(device.layout.xover_f0norm)))

    def state_signature(self) -> str:
        up = "u" if self._upsample else ""
        return f"convolution[{self.n_chan}x{self.n_segs}{up}]"

    def device_update(self, buffer=None) -> dict:
        self._bake(buffer)
        C = max(self.n_chan, 1)
        S = max(self.n_segs, 1)
        ff = (self._freq_filter if self._freq_filter is not None
              else np.zeros((C, S, FFT // 2 + 1), np.complex64))
        fir = self._fir if self._fir is not None else np.zeros((C, SEG), f32)
        return {
            "fifo": jnp.zeros(FFT, jnp.float32),       # prev 128 ++ new 128
            "freq_hist": jnp.zeros((S, FFT // 2 + 1, 2), jnp.float32),
            "out_overlap": jnp.zeros((C, FFT), jnp.float32),
            "gain_cur": jnp.zeros((C, self.device.n_dry), jnp.float32),
            "split_z": jnp.zeros((C, 3), jnp.float32),   # UpsampleMix state
            "fir_c": jnp.asarray(fir),
            "flt_re": jnp.asarray(np.real(ff).astype(f32)),
            "flt_im": jnp.asarray(np.imag(ff).astype(f32)),
        }

    def _bake(self, buffer) -> None:
        """deviceUpdate (convolution.cpp:268-421): partition the IR."""
        self.n_chan = self.n_segs = 0
        self._fir = self._freq_filter = None
        self.ambi_order = 0
        self._upsample = False
        if buffer is None or getattr(buffer, "sample_len", 0) < 1:
            return
        fmt = buffer.fmt_channels
        data = buffer.data.astype(np.float64)          # [C, N] planar
        if is_uhj(fmt):
            # UHJ IRs decode to B-Format up front with the FIR512 decoder
            # (convolution.cpp:270 UhjDecoder<512>, :343-360); the decoded
            # set is FuMa-ordered (W,X,Y[,Z]) with N3D scaling (:295-296).
            from ..utils.uhjdecoder import decode as uhj_decode
            # Host-side bake: pin to the CPU backend (the axon TPU plugin
            # cannot run eager complex-valued ops outside jit).
            with jax.default_device(jax.devices("cpu")[0]):
                data = uhj_decode(data.T.astype(f32),
                                  "fir512").T.astype(np.float64)
            self.ambi_layout = AmbiLayout.FUMA
            self.ambi_scaling = AmbiScaling.N3D
            self.ambi_order = 1
        elif is_ambisonic(fmt):
            self.ambi_layout = buffer.ambi_layout
            self.ambi_scaling = buffer.ambi_scaling
            self.ambi_order = min(buffer.ambi_order, MAX_CONVOLVE_AMBI_ORDER)
            # Only the first-order channels convolve (order capped).
            n_keep = (self.ambi_order * 2 + 1 if fmt == FmtChannels.BFORMAT2D
                      else (self.ambi_order + 1) ** 2)
            data = data[:n_keep]
        if buffer.sample_rate != self.device.sample_rate:
            from ..utils.polyphase import polyphase_resample
            data = np.stack([polyphase_resample(row, buffer.sample_rate,
                                                self.device.sample_rate)
                             for row in data])
        C, N = data.shape
        self.n_chan = C
        self.fmt_channels = fmt
        if is_ambisonic(fmt):
            dev = self.device
            hf = np.ones(C, f32)
            lf = np.ones(C, f32)
            if (fmt == FmtChannels.UHJ2
                    and not dev.layout.uhj_output):
                self._upsample = True
                hf[:] = 1.0
                lf[:] = [0.661, 1.293, 1.293]   # sWLFScale / sXYLFScale
            elif dev.layout.ambi_order > self.ambi_order:
                self._upsample = True
                scales = ambidefs.hf_order_scales(
                    self.ambi_order, dev.layout.ambi_order,
                    dev.layout.m2d_mixing)
                hf[0] = scales[0]
                hf[1:] = scales[1]
            self._hf_scale = hf
            self._lf_scale = lf
        else:
            self._hf_scale = np.ones(C, f32)
            self._lf_scale = np.ones(C, f32)
        self.n_segs = max((N + SEG - 1) // SEG, 2) - 1

        fir = np.zeros((C, SEG), f32)
        first = min(N, SEG)
        fir[:, :first] = data[:, :first].astype(f32)
        self._fir = fir

        spec = np.zeros((C, self.n_segs, FFT // 2 + 1), np.complex64)
        done = first
        for s in range(self.n_segs):
            todo = min(max(N - done, 0), SEG)
            seg = np.zeros((C, FFT), np.float64)
            seg[:, :todo] = data[:, done:done + todo]
            spec[:, s] = np.fft.rfft(seg, axis=1).astype(np.complex64)
            done += todo
        self._freq_filter = spec

    def update(self, slot, props) -> dict:
        dev = self.device
        C = max(self.n_chan, 1)
        tgt = np.zeros((C, dev.n_dry), f32)
        if self.n_chan and is_ambisonic(self.fmt_channels):
            # Ambisonic IR: first-order listener-orientation remap
            # (convolution.cpp:512-543).  N/V/U from the effect's At/Up
            # vectors; each IR channel (layout-mapped to its ACN) lands on
            # the ambi bus through the rotated row scaled to N3D.
            n = np.asarray(props.get("orient_at", (0.0, 0.0, -1.0)), f32)
            v = np.asarray(props.get("orient_up", (0.0, 1.0, 0.0)), f32)
            n = n / max(np.linalg.norm(n), 1e-20)
            v = v / max(np.linalg.norm(v), 1e-20)
            u = np.cross(n, v)
            u = u / max(np.linalg.norm(u), 1e-20)
            mixmatrix = np.array([
                [1.0,  0.0,   0.0,   0.0],
                [0.0,  u[0], -u[1],  u[2]],
                [0.0, -v[0],  v[1], -v[2]],
                [0.0, -n[0],  n[1], -n[2]],
            ], f32)
            fuma = self.ambi_layout == AmbiLayout.FUMA
            if self.fmt_channels in _2D_FMTS:
                index_map = (ambidefs.INDEX_FROM_FUMA_2D if fuma
                             else ambidefs.INDEX_FROM_ACN_2D)
            else:
                index_map = (ambidefs.INDEX_FROM_FUMA if fuma
                             else ambidefs.INDEX_FROM_ACN)
            scales = {AmbiScaling.FUMA: ambidefs.FROM_FUMA,
                      AmbiScaling.SN3D: ambidefs.FROM_SN3D,
                      AmbiScaling.N3D: ambidefs.FROM_N3D}[self.ambi_scaling]
            for c in range(self.n_chan):
                acn = int(index_map[c])
                coeffs = np.zeros(ambidefs.MAX_AMBI_CHANNELS, f32)
                coeffs[:4] = mixmatrix[acn] * scales[acn]
                tgt[c] = panning.compute_pan_gains(
                    dev.layout.dry_acn, dev.layout.dry_scale, coeffs,
                    slot.gain)
            return {"gain_tgt": tgt,
                    "hf_scale": self._hf_scale, "lf_scale": self._lf_scale}
        if self.n_chan and self.fmt_channels in CHAN_POS_MAPS:
            chanmap = CHAN_POS_MAPS[self.fmt_channels]
            pairwise = dev.layout.mode == panning.RenderMode.PAIRWISE
            for i, (ch, pos) in enumerate(chanmap[:C]):
                if ch == Channel.LFE:
                    continue
                p = np.array(pos, f32)
                if pairwise:
                    p = panning.scale_azimuth_front3(p)
                coeffs = ambidefs.calc_direction_coeffs(p, 0.0)
                tgt[i] = panning.compute_pan_gains(
                    dev.layout.dry_acn, dev.layout.dry_scale, coeffs, slot.gain)
        return {"gain_tgt": tgt,
                "hf_scale": self._hf_scale, "lf_scale": self._lf_scale}

    def process(self, state, params, wet, T: int):
        if self.n_chan == 0 or self.n_segs == 0:
            return jnp.zeros((self.device.n_dry, T), jnp.float32), None, state
        assert T % SEG == 0
        C = self.n_chan
        x_subs = wet[0].reshape(T // SEG, SEG)
        flt = state["flt_re"] + 1j * state["flt_im"]           # [C, S, 129]
        fir = state["fir_c"]
        win_idx = jnp.asarray(_WIN_IDX)

        def subblock(carry, x_new):
            fifo, fhist, overlap = carry
            inbuf = jnp.concatenate([fifo[SEG:], x_new])       # [256]
            windows = inbuf[win_idx]                           # [128, 128]
            fir_out = jnp.einsum("ik,ck->ci", windows, fir,
                                 precision=jax.lax.Precision.HIGHEST)
            out = fir_out + overlap[:, :SEG]

            # Newest-first spectra ring of zero-padded partitions.
            frame = jnp.fft.rfft(x_new, n=FFT)
            fhist = jnp.concatenate(
                [jnp.stack([frame.real, frame.imag], -1)[None], fhist[:-1]],
                axis=0)
            fhc = fhist[..., 0] + 1j * fhist[..., 1]           # [S, 129]
            acc = jnp.einsum("sf,csf->cf", fhc, flt)
            y = jnp.fft.irfft(acc, n=FFT, axis=1)              # [C, 256]
            overlap = jnp.concatenate([y[:, :SEG] + overlap[:, SEG:],
                                       y[:, SEG:]], axis=1)
            return (inbuf, fhist, overlap), out

        (fifo, fhist, over), outs = jax.lax.scan(
            subblock, (state["fifo"], state["freq_hist"], state["out_overlap"]),
            x_subs)
        out_lines = jnp.transpose(outs, (1, 0, 2)).reshape(C, T)

        new_state = dict(state)
        if self._upsample:
            # UpsampleMix (convolution.cpp:256-265): band-split HF/LF scale
            # per channel ahead of the pan (first-order IR on a higher-order
            # bus, or the UHJ2 W/XY LF shelving).
            out_lines, sp = self._splitter_k.scale(
                out_lines, state["split_z"],
                jnp.asarray(params["hf_scale"]),
                jnp.asarray(params["lf_scale"]))
            new_state["split_z"] = sp

        mixed, new_cur = effect_mix(out_lines, state["gain_cur"],
                                    jnp.asarray(params["gain_tgt"]), T)
        new_state.update(fifo=fifo, freq_hist=fhist, out_overlap=over,
                         gain_cur=new_cur)
        return mixed, None, new_state
