"""Silero-VAD v5 in JAX + speech segmentation + audio splicing.

reference: VAD model/graph (src/whisper.cpp:4361-5200), hysteresis state
machine whisper_vad_segments_from_probs (:5202-5435), audio splicing +
time-mapping whisper_vad (:6615-6793), remap (:7882-7960), model file
written by models/convert-silero-vad-to-ggml.py.

TPU-first layout: the reference rebuilds/reruns a per-chunk ggml graph and
round-trips one probability per 512-sample window (:5128-5180). Here the
STFT + conv encoder for ALL windows run as one batched jitted program, and
only the tiny LSTM recurrence runs as `lax.scan` over windows — the whole
utterance is one device call.

Architecture (Silero v5, 16 kHz): reflect-pad(64) -> conv(k=256, s=128) STFT
basis -> magnitude over 129 bins -> 4x conv1d+ReLU (129->128->64->64->128,
strides 1,2,2,1) -> take t=0 -> LSTMCell(128) -> ReLU -> 1x1 conv -> sigmoid.
"""

from __future__ import annotations

import dataclasses
import struct
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from whisper_tpu.checkpoint import quant
from whisper_tpu.config import SAMPLE_RATE, VadParams

GGML_MAGIC = 0x67676D6C


@dataclasses.dataclass
class VadHParams:
    n_window: int = 512
    n_context: int = 64
    n_encoder_layers: int = 4
    encoder_in_channels: Tuple[int, ...] = (129, 128, 64, 64)
    encoder_out_channels: Tuple[int, ...] = (128, 64, 64, 128)
    kernel_sizes: Tuple[int, ...] = (3, 3, 3, 3)
    lstm_input_size: int = 128
    lstm_hidden_size: int = 128
    final_conv_in: int = 128
    final_conv_out: int = 1


@dataclasses.dataclass
class VadModel:
    hparams: VadHParams
    params: Dict[str, np.ndarray]
    model_type: str = "silero-16k"
    version: str = "5.0.0"


ENCODER_STRIDES = (1, 2, 2, 1)


def read_vad_ggml(path_or_file) -> VadModel:
    """Parse the silero .bin container (format: convert-silero-vad-to-ggml.py,
    reader src/whisper.cpp:4777-5090)."""
    f = open(path_or_file, "rb") if isinstance(path_or_file, (str, bytes)) else path_or_file
    own = isinstance(path_or_file, (str, bytes))
    try:
        (magic,) = struct.unpack("<I", f.read(4))
        if magic != GGML_MAGIC:
            raise ValueError(f"invalid VAD model (bad magic 0x{magic:08x})")
        (slen,) = struct.unpack("<i", f.read(4))
        model_type = f.read(slen).decode("utf-8")
        major, minor, patch = struct.unpack("<3i", f.read(12))
        n_window, n_context = struct.unpack("<2i", f.read(8))
        (n_layers,) = struct.unpack("<i", f.read(4))
        ins, outs, ks = [], [], []
        for _ in range(n_layers):
            i, o, k = struct.unpack("<3i", f.read(12))
            ins.append(i); outs.append(o); ks.append(k)
        lstm_in, lstm_hid, fc_in, fc_out = struct.unpack("<4i", f.read(16))
        hp = VadHParams(n_window, n_context, n_layers, tuple(ins), tuple(outs),
                        tuple(ks), lstm_in, lstm_hid, fc_in, fc_out)

        tensors: Dict[str, np.ndarray] = {}
        while True:
            hdr = f.read(12)
            if len(hdr) < 12:
                break
            n_dims, name_len, ttype = struct.unpack("<3i", hdr)
            ne = struct.unpack(f"<{n_dims}i", f.read(4 * n_dims))
            name = f.read(name_len).decode("utf-8")
            nelems = int(np.prod(ne))
            raw = f.read(quant.row_nbytes(ttype, nelems))
            arr = quant.dequantize(raw, ttype, nelems).reshape(
                tuple(reversed(ne)))
            if name == "_model.decoder.decoder.2.weight":
                # stored squeezed ([final_conv_in] or [1, in]) per the
                # reference converter; the forward pass wants (1, in, 1)
                arr = arr.reshape(1, -1, 1)
            tensors[name] = arr
        return VadModel(hp, tensors, model_type,
                        f"{major}.{minor}.{patch}")
    finally:
        if own:
            f.close()


def write_vad_ggml(path, model: VadModel) -> None:
    """Writer (mirror of convert-silero-vad-to-ggml.py) for tests/tools."""
    hp = model.hparams
    with open(path, "wb") as f:
        f.write(struct.pack("<I", GGML_MAGIC))
        mt = model.model_type.encode()
        f.write(struct.pack("<i", len(mt)))
        f.write(mt)
        f.write(struct.pack("<3i", *[int(x) for x in model.version.split(".")]))
        f.write(struct.pack("<2i", hp.n_window, hp.n_context))
        f.write(struct.pack("<i", hp.n_encoder_layers))
        for i in range(hp.n_encoder_layers):
            f.write(struct.pack("<3i", hp.encoder_in_channels[i],
                                hp.encoder_out_channels[i], hp.kernel_sizes[i]))
        f.write(struct.pack("<4i", hp.lstm_input_size, hp.lstm_hidden_size,
                            hp.final_conv_in, hp.final_conv_out))
        for name, arr in model.params.items():
            # conv weights (encoder reparam convs, final decoder conv, STFT
            # basis) are stored f16, everything else f32 — whisper.cpp's
            # VAD loader allocates with exactly these types and reads data
            # raw (convert-silero-vad-to-ggml.py:147-154)
            is_conv_w = ("weight" in name and (
                "encoder" in name or "_model.decoder.decoder.2" in name)
                ) or "stft" in name
            if name == "_model.decoder.decoder.2.weight":
                # whisper.cpp allocates this as [final_conv_in, 1] 2-D
                # (src/whisper.cpp:4980-4983); the converter writes it
                # squeezed — mirror that
                arr = np.asarray(arr).reshape(1, -1)
            if is_conv_w:
                arr = np.ascontiguousarray(arr, np.float16)
                ttype = quant.GGML_TYPE_F16
            else:
                arr = np.ascontiguousarray(arr, np.float32)
                ttype = quant.GGML_TYPE_F32
            ne = tuple(reversed(arr.shape))
            nb = name.encode()
            f.write(struct.pack("<3i", len(ne), len(nb), ttype))
            f.write(struct.pack(f"<{len(ne)}i", *ne))
            f.write(nb)
            f.write(arr.tobytes())


def random_vad_model(seed: int = 0) -> VadModel:
    """Random weights in the exact converter layout (stub-model analogue)."""
    rng = np.random.default_rng(seed)
    hp = VadHParams()
    p = {}
    for i in range(hp.n_encoder_layers):
        cin, cout, k = hp.encoder_in_channels[i], hp.encoder_out_channels[i], hp.kernel_sizes[i]
        p[f"_model.encoder.{i}.reparam_conv.weight"] = (
            rng.standard_normal((cout, cin, k)).astype(np.float32) * (cin * k) ** -0.5)
        p[f"_model.encoder.{i}.reparam_conv.bias"] = np.zeros(cout, np.float32)
    H = hp.lstm_hidden_size
    p["_model.decoder.rnn.weight_ih"] = rng.standard_normal((4 * H, H)).astype(np.float32) * H**-0.5
    p["_model.decoder.rnn.weight_hh"] = rng.standard_normal((4 * H, H)).astype(np.float32) * H**-0.5
    p["_model.decoder.rnn.bias_ih"] = np.zeros(4 * H, np.float32)
    p["_model.decoder.rnn.bias_hh"] = np.zeros(4 * H, np.float32)
    p["_model.decoder.decoder.2.weight"] = rng.standard_normal((1, H, 1)).astype(np.float32) * H**-0.5
    p["_model.decoder.decoder.2.bias"] = np.zeros(1, np.float32)
    # DFT basis: rows = [real(129); imag(129)] of kernel 256
    k = np.arange(129)[:, None]
    n = np.arange(256)[None, :]
    real = np.cos(2 * np.pi * k * n / 256)
    imag = -np.sin(2 * np.pi * k * n / 256)
    basis = np.concatenate([real, imag], axis=0).astype(np.float32)  # (258, 256)
    p["_model.stft.forward_basis_buffer"] = basis.reshape(258, 1, 256)
    # conv weights are stored f16 in the container (see write_vad_ggml);
    # pre-round them so in-memory and written-then-loaded models are
    # bit-identical (keeps roundtrip tests exact and differential-parity
    # runs using the same values both sides)
    for name in list(p):
        if "weight" in name and ("encoder" in name
                                 or "decoder.decoder.2" in name) \
                or "stft" in name:
            p[name] = p[name].astype(np.float16).astype(np.float32)
    return VadModel(hp, p)


# ---------------------------------------------------------------------------
# forward pass
# ---------------------------------------------------------------------------


def _conv1d_nwc(x, w_oik, bias, stride, padding):
    """x: (N, T, C); w_oik: (out, in, k) converter layout."""
    w = jnp.transpose(jnp.asarray(w_oik), (2, 1, 0))  # (k, in, out)
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NWC", "WIO", "NWC"))
    y = lax.conv_general_dilated(x, w, (stride,), ((padding, padding),),
                                 dimension_numbers=dn)
    return y + jnp.asarray(bias)


def vad_probs_jit(params, hp: VadHParams, chunks: jax.Array) -> jax.Array:
    """chunks: (N, n_window) -> per-window speech probabilities (N,).

    STFT + encoder batched over all windows; LSTM as scan."""
    N = chunks.shape[0]
    # reflect pad 64 both sides (reference ggml_pad_reflect_1d, :4537)
    left = chunks[:, 1:65][:, ::-1]
    right = chunks[:, -65:-1][:, ::-1]
    padded = jnp.concatenate([left, chunks, right], axis=1)   # (N, 640)

    basis = jnp.asarray(params["_model.stft.forward_basis_buffer"])  # (258,1,256)
    x = padded[:, :, None]                                     # (N, 640, 1)
    # STFT hop = n_window/4 (128 for Silero v5). It numerically equals
    # lstm_input_size for the shipped models, but the two are unrelated
    # header fields — derive the hop from the window (r4 review)
    stft = _conv1d_nwc(x, basis, jnp.zeros(258, jnp.float32),
                       stride=hp.n_window // 4, padding=0)     # (N, 4, 258)
    cutoff = basis.shape[0] // 2
    mag = jnp.sqrt(stft[..., :cutoff] ** 2 + stft[..., cutoff:2 * cutoff] ** 2)

    h = mag                                                    # (N, 4, 129)
    for i in range(hp.n_encoder_layers):
        h = _conv1d_nwc(h, params[f"_model.encoder.{i}.reparam_conv.weight"],
                        params[f"_model.encoder.{i}.reparam_conv.bias"],
                        stride=ENCODER_STRIDES[i], padding=1)
        h = jax.nn.relu(h)
    feat = h[:, 0, :]                                          # (N, 128) — [:, :, 0]

    H = hp.lstm_hidden_size
    w_ih = jnp.asarray(params["_model.decoder.rnn.weight_ih"])   # (4H, H)
    w_hh = jnp.asarray(params["_model.decoder.rnn.weight_hh"])
    b = (jnp.asarray(params["_model.decoder.rnn.bias_ih"])
         + jnp.asarray(params["_model.decoder.rnn.bias_hh"]))

    def cell(carry, x_t):
        h_t, c_t = carry
        gates = x_t @ w_ih.T + h_t @ w_hh.T + b
        i_g = jax.nn.sigmoid(gates[:H])
        f_g = jax.nn.sigmoid(gates[H:2 * H])
        g_g = jnp.tanh(gates[2 * H:3 * H])
        o_g = jax.nn.sigmoid(gates[3 * H:])
        c_new = f_g * c_t + i_g * g_g
        h_new = o_g * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    init = (jnp.zeros(H, jnp.float32), jnp.zeros(H, jnp.float32))
    _, hs = lax.scan(cell, init, feat)                         # (N, H)

    out = jax.nn.relu(hs)
    w_fc = jnp.asarray(params["_model.decoder.decoder.2.weight"])[:, :, 0]  # (1, H)
    b_fc = jnp.asarray(params["_model.decoder.decoder.2.bias"])
    probs = jax.nn.sigmoid(out @ w_fc.T + b_fc)                # (N, 1)
    return probs[:, 0]


_vad_jit_cache = {}


def detect_speech(model: VadModel, samples: np.ndarray) -> np.ndarray:
    """Per-window speech probabilities (reference whisper_vad_detect_speech,
    :5100-5186). Zero-pads the trailing partial window."""
    hp = model.hparams
    n = len(samples)
    n_chunks = -(-n // hp.n_window) if n else 0
    if n_chunks == 0:
        return np.zeros(0, np.float32)
    buf = np.zeros(n_chunks * hp.n_window, np.float32)
    buf[:n] = samples
    chunks = buf.reshape(n_chunks, hp.n_window)

    # keyed by ARCHITECTURE (weights are call arguments): id(model) keys
    # could alias a garbage-collected model's closure after CPython reuses
    # the address, and grew one compiled program per model object (r4)
    key = tuple(sorted(hp.__dict__.items()))
    fn = _vad_jit_cache.get(key)
    if fn is None:
        import functools
        fn = jax.jit(functools.partial(vad_probs_jit, hp=hp))
        _vad_jit_cache[key] = fn
    return np.asarray(fn(model.params, chunks=jnp.asarray(chunks)))


@dataclasses.dataclass
class SpeechSegment:
    start: int  # centiseconds
    end: int


def _samples_to_cs(s: int) -> int:
    return int(s / SAMPLE_RATE * 100.0 + 0.5)


def _cs_to_samples(cs: int) -> int:
    return int(cs / 100.0 * SAMPLE_RATE + 0.5)


def segments_from_probs(
    probs: np.ndarray,
    params: VadParams,
    n_window: int = 512,
) -> List[SpeechSegment]:
    """Hysteresis state machine (reference :5202-5435)."""
    sr = SAMPLE_RATE
    n_probs = len(probs)
    threshold = params.threshold
    min_silence_samples = sr * params.min_silence_duration_ms // 1000
    audio_length_samples = n_probs * n_window
    min_speech_samples = sr * params.min_speech_duration_ms // 1000
    speech_pad_samples = sr * params.speech_pad_ms // 1000

    if params.max_speech_duration_s > 100000.0:
        max_speech_samples = 2**31 // 2
    else:
        # the reference truncates the FLOAT duration to int64 seconds
        # BEFORE multiplying (whisper.cpp:5229): (int64_t)(1.5) == 1 —
        # fractional durations must split where the reference splits (r4)
        max_speech_samples = (sr * int(params.max_speech_duration_s)
                              - n_window - 2 * speech_pad_samples)
        if max_speech_samples < 0:
            max_speech_samples = 2**31 // 2
    min_silence_at_max = sr * 98 // 1000
    neg_threshold = max(threshold - 0.15, 0.01)

    speeches: List[List[int]] = []
    is_speech = False
    temp_end = prev_end = next_start = 0
    cur_start = 0
    has_cur = False

    for i in range(n_probs):
        prob = float(probs[i])
        cur = n_window * i

        if prob >= threshold and temp_end:
            temp_end = 0
            if next_start < prev_end:
                next_start = cur

        if prob >= threshold and not is_speech:
            is_speech = True
            cur_start = cur
            has_cur = True
            continue

        if is_speech and (cur - cur_start) > max_speech_samples:
            if prev_end:
                speeches.append([cur_start, prev_end])
                has_cur = True
                if next_start < prev_end:
                    is_speech = False
                    has_cur = False
                else:
                    cur_start = next_start
                prev_end = next_start = temp_end = 0
            else:
                speeches.append([cur_start, cur])
                prev_end = next_start = temp_end = 0
                is_speech = False
                has_cur = False
                continue

        if prob < neg_threshold and is_speech:
            if not temp_end:
                temp_end = cur
            if (cur - temp_end) > min_silence_at_max:
                prev_end = temp_end
            if (cur - temp_end) < min_silence_samples:
                continue
            if (temp_end - cur_start) > min_speech_samples:
                speeches.append([cur_start, temp_end])
            prev_end = next_start = temp_end = 0
            is_speech = False
            has_cur = False
            continue

    if has_cur and (audio_length_samples - cur_start) > min_speech_samples:
        speeches.append([cur_start, audio_length_samples])

    # merge small gaps (<200 ms) (:5339-5359)
    merged: List[List[int]] = []
    max_gap = sr * 200 // 1000
    for s in speeches:
        if merged and s[0] - merged[-1][1] < max_gap:
            merged[-1][1] = s[1]
        else:
            merged.append(list(s))
    merged = [s for s in merged if s[1] - s[0] >= min_speech_samples]

    # padding (:5375-5420)
    out = []
    for i, s in enumerate(merged):
        if i == 0:
            s[0] = max(0, s[0] - speech_pad_samples)
        if i < len(merged) - 1:
            gap = merged[i + 1][0] - s[1]
            if gap < 2 * speech_pad_samples:
                s[1] += gap // 2
                merged[i + 1][0] = max(0, merged[i + 1][0] - gap // 2)
            else:
                s[1] = min(s[1] + speech_pad_samples, audio_length_samples)
                merged[i + 1][0] = max(0, merged[i + 1][0] - speech_pad_samples)
        else:
            s[1] = min(s[1] + speech_pad_samples, audio_length_samples)
        out.append(SpeechSegment(_samples_to_cs(s[0]), _samples_to_cs(s[1])))
    return out


def vad_filter_audio(state, samples: np.ndarray, params) -> Tuple[Optional[np.ndarray], List]:
    """Splice speech segments with 0.1 s silence gaps; build the piecewise-
    linear time-mapping table (reference whisper_vad, :6615-6793).

    Returns (filtered_samples or None, mapping_table [(processed, original)])."""
    if getattr(state, "vad_model", None) is None:
        if params.vad_model_path:
            state.vad_model = read_vad_ggml(params.vad_model_path)
        else:
            raise ValueError("vad enabled but no vad_model_path set")
    model = state.vad_model

    probs = detect_speech(model, samples)
    segs = segments_from_probs(probs, params.vad_params, model.hparams.n_window)
    if not segs:
        return None, []

    n_samples = len(samples)
    sr = SAMPLE_RATE
    overlap_samples = int(params.vad_params.samples_overlap * sr)
    silence_samples = int(0.1 * sr)

    mapping: List[Tuple[int, int]] = []
    pieces: List[np.ndarray] = []
    offset = 0
    for i, seg in enumerate(segs):
        s0 = _cs_to_samples(seg.start)
        s1 = _cs_to_samples(seg.end)
        if i < len(segs) - 1:
            s1 += overlap_samples
        s0 = min(s0, n_samples - 1)
        s1 = min(s1, n_samples)
        seg_len = s1 - s0
        if seg_len <= 0:
            continue
        vad_start = _samples_to_cs(offset)
        vad_end = _samples_to_cs(offset + seg_len)
        mapping.append((vad_start, seg.start))
        mapping.append((vad_end, seg.end))
        # intermediate interpolation points every 200 ms (:6723-6743)
        if vad_end - vad_start > 100:
            dur = vad_end - vad_start
            orig_total = seg.end - seg.start
            npts = dur // 20 - 1
            for j in range(1, npts + 1):
                vt = vad_start + j * 20
                if vt >= vad_end:
                    continue
                ot = seg.start + (vt - vad_start) * orig_total // dur
                mapping.append((vt, ot))
        pieces.append(samples[s0:s1])
        offset += seg_len
        if i < len(segs) - 1:
            sil_start = _samples_to_cs(offset)
            sil_end = _samples_to_cs(offset + silence_samples)
            mapping.append((sil_start, seg.end))
            mapping.append((sil_end, segs[i + 1].start))
            pieces.append(np.zeros(silence_samples, np.float32))
            offset += silence_samples

    mapping.sort(key=lambda m: m[0])
    dedup = []
    for m in mapping:
        if not dedup or m[0] != dedup[-1][0]:
            dedup.append(m)
    return np.concatenate(pieces).astype(np.float32), dedup


def map_processed_to_original_time(t: int, mapping: List[Tuple[int, int]]) -> int:
    """Linear interpolation over the mapping table (reference :7882-7921)."""
    if not mapping:
        return t
    if t <= mapping[0][0]:
        return mapping[0][1]
    if t >= mapping[-1][0]:
        return mapping[-1][1]
    import bisect
    idx = bisect.bisect_left(mapping, (t, -(10**18)))
    upper = mapping[idx]
    if upper[0] == t:
        return upper[1]
    lower = mapping[idx - 1]
    pd = upper[0] - lower[0]
    od = upper[1] - lower[1]
    if pd == 0:
        return lower[1]
    return lower[1] + (t - lower[0]) * od // pd


def remap_segment_times(segment, mapping: List[Tuple[int, int]]) -> None:
    """Remap a segment's t0/t1 through the VAD mapping (reference
    whisper_full_get_segment_t{0,1}_from_state, :7925-7961, including the
    10-unit minimum-duration clamp). Token-level times (t0/t1/t_dtw) are
    intentionally NOT remapped: the reference's token-data getters return
    the raw processed-time values (whisper_full_get_token_data just reads
    result_all), so its JSON-full output mixes remapped segment times with
    processed token times — bug-for-bug."""
    t0 = map_processed_to_original_time(segment.t0, mapping)
    t1 = map_processed_to_original_time(segment.t1, mapping)
    if t1 - t0 < 10:
        t1 = t0 + 10
    segment.t0, segment.t1 = t0, t1


def vad_segments_from_samples(model: VadModel, samples: np.ndarray,
                              params) -> List[SpeechSegment]:
    """One-call probs+segment detection (reference
    whisper_vad_segments_from_samples, src/whisper.cpp:5437-5449)."""
    probs = detect_speech(model, samples)
    return segments_from_probs(probs, params, n_window=model.hparams.n_window)


class VadContext:
    """Standalone VAD context mirroring the reference's object API
    (include/whisper.h:675-716: whisper_vad_init_from_file_with_params,
    whisper_vad_detect_speech, whisper_vad_n_probs/probs,
    whisper_vad_segments_from_probs/samples). Python GC replaces
    whisper_vad_free/free_segments; segment getters return centiseconds on
    the SpeechSegment records (the reference's t0/t1 floats are cs too)."""

    def __init__(self, model: VadModel):
        self.model = model
        self._probs = np.zeros(0, np.float32)

    @classmethod
    def init_from_file_with_params(cls, path: str) -> "VadContext":
        return cls(read_vad_ggml(path))

    # whisper_vad_init_with_params takes a model_loader (buffer source)
    init_with_params = init_from_file_with_params

    def detect_speech(self, samples: np.ndarray) -> bool:
        """whisper.h:690-693 — runs the model, retains per-window probs."""
        self._probs = detect_speech(self.model, np.asarray(samples, np.float32))
        return True

    @property
    def n_probs(self) -> int:
        return len(self._probs)

    @property
    def probs(self) -> np.ndarray:
        return self._probs

    def segments_from_probs(self, params) -> List[SpeechSegment]:
        return segments_from_probs(self._probs, params,
                                   n_window=self.model.hparams.n_window)

    def segments_from_samples(self, params,
                              samples: np.ndarray) -> List[SpeechSegment]:
        self.detect_speech(samples)
        return self.segments_from_probs(params)
