"""Public API: WhisperContext / WhisperState.

Mirrors the reference's Rust surface (whisper-rs):
- WhisperContext: shared immutable model (src/whisper_ctx_wrapper.rs) —
  cheap to share across states; weights are read-only device arrays.
- WhisperState: per-stream mutable inference state
  (src/whisper_state.rs) — mel, encoder output, KV caches, segments.

The reference requires one state per thread; here a state is just a Python
object holding device arrays, and every compute call is a pure jitted
function, so states are trivially independent (SURVEY.md §5.2).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from whisper_tpu import config as cfg
from whisper_tpu.audio import mel as mel_mod
from whisper_tpu.checkpoint import init as init_mod
from whisper_tpu.checkpoint import loader as loader_mod
from whisper_tpu.config import ContextParams, FullParams, WhisperHParams
from whisper_tpu.models import whisper as model_mod
from whisper_tpu.tokenizer import Tokenizer
from whisper_tpu.utils.timings import Timings


@dataclasses.dataclass
class TokenData:
    """Per-token result (reference whisper_token_data, include/whisper.h:168-189)."""

    id: int
    tid: int          # forced timestamp token id
    p: float          # probability
    plog: float       # log prob
    pt: float         # prob of the timestamp token
    ptsum: float      # sum prob of all timestamp tokens
    t0: int = -1      # token-level start time (10 ms units)
    t1: int = -1
    t_dtw: int = -1   # DTW timestamp
    vlen: float = 0.0  # voice length


@dataclasses.dataclass
class Segment:
    """reference whisper_segment (src/whisper.cpp:494-503)."""

    t0: int           # centiseconds (10 ms units)
    t1: int
    text: str
    tokens: List[TokenData] = dataclasses.field(default_factory=list)
    speaker_turn_next: bool = False
    no_speech_prob: float = 0.0


class WhisperContext:
    """Immutable model container + jit caches."""

    def __init__(self, model: loader_mod.LoadedModel, params: Optional[ContextParams] = None,
                 host_params_rebuild=None):
        self.cparams = params or ContextParams()
        self.hparams = model.hparams
        self.vocab = model.vocab
        self.tokenizer = Tokenizer(model.vocab)
        self.mel_filters = model.mel_filters
        self.n_loaded = model.n_loaded
        self.dtype = jnp.bfloat16 if self.cparams.dtype == "bfloat16" else jnp.float32
        # int8 self-KV cache (ContextParams.kv_dtype): halves cache HBM
        self.kv_quant = self.cparams.kv_dtype == "int8"
        # upload weights once; jax caches device placement. use_gpu=False
        # pins them (and therefore every jit that consumes them — committed
        # operands drive placement) to the CPU backend; gpu_device selects
        # the accelerator index (reference whisper_context_params.use_gpu/
        # gpu_device — these were accepted but silently ignored, r4 review)
        self._device = None
        if not self.cparams.use_gpu:
            self._device = jax.devices("cpu")[0]
        elif self.cparams.gpu_device:
            devs = jax.devices()
            if self.cparams.gpu_device < len(devs):
                self._device = devs[self.cparams.gpu_device]
        if model.params and self._device is not None:
            self.params = jax.tree_util.tree_map(
                lambda x: jax.device_put(jnp.asarray(x), self._device),
                model.params)
        else:
            self.params = (jax.tree_util.tree_map(jnp.asarray, model.params)
                           if model.params else {})
        # cpu_twin() needs a HOST weight copy (reading weights back from the
        # device is impossible on D2H-less TPU serving relays). Holding the
        # loader's numpy pytree would pin ~2 GB of host RAM at large-v3 for
        # every context whether or not a twin is ever used (VERDICT r2), so
        # constructors pass a rebuild closure instead and the host copy is
        # dropped right after upload; cpu_twin() re-reads the checkpoint on
        # first use. Contexts constructed directly from a LoadedModel (no
        # closure) keep the copy — nothing to rebuild from.
        self._rebuild_host = host_params_rebuild
        self._host_params = None if host_params_rebuild is not None else (model.params or {})
        # speculative-decoding draft model (decoding/speculative.py);
        # attached via attach_draft() or ContextParams.draft_model
        self.draft: Optional["WhisperContext"] = None

    # -- constructors mirroring the reference API ---------------------------
    @classmethod
    def new_with_params(cls, path: str, params: Optional[ContextParams] = None) -> "WhisperContext":
        """reference whisper_init_from_file_with_params (src/whisper.cpp:3640)."""
        from whisper_tpu.errors import InitError, WhisperError
        cp = params or ContextParams()
        try:
            model = loader_mod.load_model(path, cp.dtype, cp.keep_quantized)
        except WhisperError:
            raise
        except (OSError, ValueError, EOFError) as e:
            raise InitError(f"failed to load model '{path}': {e}") from e
        ctx = cls(model, params, host_params_rebuild=lambda: loader_mod.load_model(
            path, cp.dtype, cp.keep_quantized).params)
        if cp.draft_model:
            import dataclasses as _dc
            # keep_quantized is inherited: the k draft forwards per round
            # are the speculation overhead, and int8-resident draft weights
            # halve that read (PERF.md "Speculative greedy decoding")
            dcp = _dc.replace(cp, draft_model=None)
            ctx.attach_draft(cls.new_with_params(cp.draft_model, dcp))
        return ctx

    @classmethod
    def from_buffer(cls, buf, params: Optional[ContextParams] = None) -> "WhisperContext":
        """reference whisper_init_from_buffer_with_params (src/whisper.cpp:3680)."""
        import io
        from whisper_tpu.errors import InitError, WhisperError
        cp = params or ContextParams()
        try:
            ckpt = loader_mod.ggml_io.read_ggml(io.BytesIO(buf))
            model = loader_mod.params_from_checkpoint(
                ckpt, cp.dtype, cp.keep_quantized)
        except WhisperError:
            raise
        except (OSError, ValueError, EOFError) as e:
            # same error contract as new_with_params (reference returns
            # nullptr from whisper_init_from_buffer_with_params; r4 review)
            raise InitError(f"failed to load model from buffer: {e}") from e
        # the caller owns `buf` already; re-parsing it on twin demand costs
        # no extra resident memory beyond that existing buffer
        return cls(model, params,
                   host_params_rebuild=lambda: loader_mod.params_from_checkpoint(
                       loader_mod.ggml_io.read_ggml(io.BytesIO(buf)),
                       cp.dtype, cp.keep_quantized).params)

    @classmethod
    def random(cls, preset: str = "tiny", params: Optional[ContextParams] = None,
               hp: Optional[WhisperHParams] = None, seed: int = 0) -> "WhisperContext":
        """Random-weight context (stub-model analogue for tests/benches)."""
        return cls(init_mod.random_model(preset, seed=seed, hp=hp), params,
                   host_params_rebuild=lambda: init_mod.random_model(
                       preset, seed=seed, hp=hp).params)

    @property
    def is_stub(self) -> bool:
        """Zero-tensor checkpoint → skip real decoding (reference
        n_loaded == 0 short-circuit, src/whisper.cpp:1959-1961, 7364-7369)."""
        return self.n_loaded == 0

    def is_multilingual(self) -> bool:
        return self.hparams.is_multilingual

    def tokenize(self, text: str, max_tokens: Optional[int] = None) -> List[int]:
        toks = self.tokenizer.encode(text)
        if max_tokens is not None and len(toks) > max_tokens:
            raise ValueError(f"text tokenizes to {len(toks)} > max {max_tokens}")
        return toks

    def create_state(self) -> "WhisperState":
        """reference whisper_init_state (src/whisper.cpp:3390-3561)."""
        return WhisperState(self)

    def attach_draft(self, draft: "WhisperContext") -> None:
        """Attach a draft model for speculative greedy decoding
        (decoding/speculative.py). The draft must share the main model's
        vocabulary — token ids are exchanged between the two models — which
        in practice means a distil checkpoint of the same family (e.g.
        distil-large-v3 for large-v3; tiny's 51865-token vocab does NOT
        match large-v3's 51866)."""
        from whisper_tpu.errors import InitError
        v_m, v_d = self.vocab, draft.vocab
        if (v_d.n_vocab != v_m.n_vocab or v_d.token_eot != v_m.token_eot
                or v_d.token_beg != v_m.token_beg
                or v_d.token_sot != v_m.token_sot):
            raise InitError(
                f"draft vocab incompatible: n_vocab {v_d.n_vocab} vs "
                f"{v_m.n_vocab} (speculative decoding requires an identical "
                "vocabulary, e.g. a distil checkpoint of the same family)")
        if draft.hparams.n_audio_ctx != self.hparams.n_audio_ctx:
            raise InitError("draft n_audio_ctx differs from main model")
        if (self.cparams.draft_shares_encoder
                and draft.hparams.n_audio_state != self.hparams.n_audio_state):
            raise InitError(
                "draft_shares_encoder requires matching encoder width "
                f"({draft.hparams.n_audio_state} vs "
                f"{self.hparams.n_audio_state})")
        self.draft = draft

    @property
    def exec_backend(self) -> str:
        """The backend this context's weights execute on ('cpu' for a
        cpu_twin regardless of the process default backend) — gates
        TPU-only paths like the Pallas flash-attention kernel."""
        if getattr(self, "_cpu_twin", None) is self:
            return "cpu"
        if getattr(self, "_device", None) is not None:
            return self._device.platform
        return jax.default_backend()

    def cpu_twin(self) -> "WhisperContext":
        """A context sharing this model's metadata with the weights placed
        on the CPU backend. Grammar / logits-callback decoding steps logits
        on the host each token (decoding/host_loop.py); on TPU serving
        relays where device->host transfers are unsupported, run_full
        transparently reroutes those requests here. Lazily built + cached
        (one weight copy, re-read from the checkpoint on first use — see
        __init__ on why no host copy is pinned up front)."""
        twin = getattr(self, "_cpu_twin", None)
        if twin is None:
            if jax.default_backend() == "cpu":
                # weights already execute on CPU: the twin is this context
                self._cpu_twin = self
                return self
            host = self._host_params
            if host is None:
                host = self._rebuild_host()
            cpu0 = jax.devices("cpu")[0]
            twin = object.__new__(WhisperContext)
            twin.__dict__.update(self.__dict__)
            twin.params = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, cpu0), host)
            twin._cpu_twin = twin
            # the twin exists for host-stepped decoding; the draft's weights
            # still live on the original backend — don't mix
            twin.draft = None
            self._cpu_twin = twin
        return twin

    def warmup(self, params: Optional[FullParams] = None,
               all_prompt_buckets: bool = True) -> None:
        """Pre-compile the mel/encoder/cross/decode-window programs so the
        first real request pays no compile latency — the XLA analogue of
        whisper_init_state's worst-case graph pre-reservation
        (src/whisper.cpp:3488-3558). Runs a throwaway full() on 30 s of
        silence with the given decode params (jit caches are shared
        module-wide, keyed by shapes + static config).

        Prompts are padded to {8, 64, n_text_ctx/2+8} buckets (see
        decoding/loop.py prompt_bucket); with all_prompt_buckets the larger
        two are warmed too via synthetic initial prompts, so cross-window
        context carry never hits a first-compile stall mid-request."""
        # first-deployment numerics guard: A/B the Pallas flash-attention
        # kernel against the XLA reference on this chip (utils/selfcheck).
        # Inconclusive on D2H-less relays (ok is None) -> keep the config;
        # a real mismatch flips this context to the XLA attention path.
        if self.cparams.flash_attn and self.exec_backend == "tpu":
            from whisper_tpu.utils.selfcheck import flash_attention_ab_check
            ok, err = flash_attention_ab_check()
            if ok is False:
                import warnings
                warnings.warn(
                    f"flash-attention kernel mismatch on this device "
                    f"(max err {err:.3g}); falling back to XLA attention")
                self.cparams = dataclasses.replace(self.cparams,
                                                   flash_attn=False)
                if self.draft is not None:
                    # the draft encoder gates on ITS OWN cparams — the bad
                    # kernel must be disabled there too (r4 review)
                    self.draft.cparams = dataclasses.replace(
                        self.draft.cparams, flash_attn=False)

        base = dataclasses.replace(params) if params is not None else FullParams.default()
        base.print_progress = False
        base.progress_callback = None
        base.new_segment_callback = None
        silence = np.zeros(30 * cfg.SAMPLE_RATE, np.float32)

        prompt_lens = [0]
        if all_prompt_buckets:
            pm = self.hparams.n_text_ctx // 2 + 8
            prompt_lens += [min(32, pm - 8), pm - 8]
        for n in prompt_lens:
            p = dataclasses.replace(base)
            p.prompt_tokens = list(range(1, n + 1)) if n else None
            st = self.create_state()
            st.full(p, silence)

    def full_batch(self, params: FullParams, audios, mesh=None,
                   n_lanes=None, stats=None):
        """Transcribe many utterances concurrently (continuous batching —
        the TPU-native replacement for whisper_full_parallel's threads;
        see decoding/batch_full.py). `n_lanes` caps the device batch:
        utterances stream through the lanes, freed lanes refill from the
        pending queue. `stats` (a dict) receives rounds / admitted /
        lane_occupancy. Returns a list of segment lists."""
        from whisper_tpu.decoding.batch_full import run_full_batch
        return run_full_batch(self, params, audios, mesh=mesh,
                              n_lanes=n_lanes, stats=stats)

    # model metadata getters (reference whisper_model_* / whisper_n_*)
    def n_vocab(self) -> int: return self.hparams.n_vocab
    def n_audio_ctx(self) -> int: return self.hparams.n_audio_ctx
    def n_text_ctx(self) -> int: return self.hparams.n_text_ctx
    def model_n_audio_state(self) -> int: return self.hparams.n_audio_state
    def model_n_audio_head(self) -> int: return self.hparams.n_audio_head
    def model_n_audio_layer(self) -> int: return self.hparams.n_audio_layer
    def model_n_text_state(self) -> int: return self.hparams.n_text_state
    def model_n_text_head(self) -> int: return self.hparams.n_text_head
    def model_n_text_layer(self) -> int: return self.hparams.n_text_layer
    def model_n_mels(self) -> int: return self.hparams.n_mels
    def model_ftype(self) -> int: return self.hparams.ftype
    def model_type(self) -> str: return self.hparams.model_type.value
    def model_type_readable(self) -> str:
        """reference whisper_model_type_readable (src/whisper.cpp:4249)."""
        return self.hparams.model_type.value

    # special token getters (reference whisper_token_*)
    def token_eot(self) -> int: return self.vocab.token_eot
    def token_sot(self) -> int: return self.vocab.token_sot
    def token_prev(self) -> int: return self.vocab.token_prev
    def token_nosp(self) -> int: return self.vocab.token_nosp
    def token_not(self) -> int: return self.vocab.token_not
    def token_beg(self) -> int: return self.vocab.token_beg
    def token_translate(self) -> int: return self.vocab.token_translate
    def token_transcribe(self) -> int: return self.vocab.token_transcribe
    def token_lang(self, lang_id: int) -> int: return self.vocab.token_lang(lang_id)
    def token_solm(self) -> int: return self.vocab.token_solm

    def token_to_str(self, token_id: int) -> str:
        """reference whisper_token_to_str (src/whisper.cpp:4240-4242)."""
        return self.tokenizer.decode([int(token_id)])


class WhisperState:
    """Per-stream inference state (reference whisper_state,
    src/whisper.cpp:862-996)."""

    def __init__(self, ctx: WhisperContext):
        self.ctx = ctx
        self.mel: Optional[jax.Array] = None   # (n_mels, n_len)
        self.n_len = 0
        self.n_len_org = 0
        self.audio_embed: Optional[jax.Array] = None   # (B, Ta, D)
        self.cross_k: Optional[jax.Array] = None
        self.cross_v: Optional[jax.Array] = None
        self.segments: List[Segment] = []
        self.lang_id: int = 0
        self.timings = Timings()
        self.no_speech_prob: float = 0.0
        self._last_logits: Optional[jax.Array] = None
        self._mel_host: Optional[np.ndarray] = None   # set_mel's host copy
        # speculative decoding: the draft model's own mel (its filterbank /
        # n_mels may differ, e.g. 80 vs large-v3's 128) and per-window
        # cross-KV (decoding/speculative.py)
        self.draft_mel: Optional[jax.Array] = None
        self.draft_cross_k: Optional[jax.Array] = None
        self.draft_cross_v: Optional[jax.Array] = None
        # {"rounds": R, "tokens": N} after a speculative run_full —
        # mean accepted run length = N / R (tune ContextParams.spec_k)
        self.spec_stats: Optional[dict] = None
        # jitted fns are cached per (ctx id); jax's jit cache dedups by shape

    # ------------------------------------------------------------------ mel
    def pcm_to_mel(self, samples: np.ndarray, debug: bool = False) -> None:
        """reference whisper_pcm_to_mel_with_state (src/whisper.cpp:3985)."""
        t0 = time.perf_counter()
        self.mel, self.n_len, self.n_len_org = mel_mod.log_mel_spectrogram(
            samples, self.ctx.mel_filters)
        self.mel.block_until_ready()
        self._mel_host = None   # stale set_mel copy, if any
        # new audio: any draft mel/cross-KV from earlier samples is stale
        # (run_full recomputes the draft mel from these samples when needed)
        self.draft_mel = None
        self.draft_cross_k = self.draft_cross_v = None
        self.timings.add("mel", time.perf_counter() - t0)
        if debug:
            # reference debug_mode mel dump (src/whisper.cpp:3264-3273)
            import json
            with open("log_mel_spectrogram.json", "w") as f:
                json.dump(np.asarray(self.mel).flatten().tolist(), f)

    def set_mel(self, mel: np.ndarray, n_len_org: Optional[int] = None) -> None:
        """reference whisper_set_mel_with_state (src/whisper.cpp:4005-4035)."""
        # validate BEFORE touching state (the reference whisper_set_mel
        # returns -1 leaving state untouched; storing _mel_host first left
        # a rejected mel for the CPU-twin reroute to pick up — r4 review)
        mel_host = np.asarray(mel)
        if mel_host.shape[0] != self.ctx.hparams.n_mels:
            raise ValueError(f"invalid n_mels {mel_host.shape[0]}")
        # keep the caller's host copy: the CPU-twin reroute (decoding/loop.py)
        # must hand the mel to the twin, and reading a device array back is
        # impossible on D2H-less relays
        self._mel_host = mel_host
        self.mel = jnp.asarray(mel_host)
        self.n_len = mel_host.shape[1]
        self.n_len_org = (n_len_org if n_len_org is not None
                          else mel_host.shape[1])
        # new audio: any draft mel/cross-KV from earlier samples is stale
        self.draft_mel = None
        self.draft_cross_k = self.draft_cross_v = None

    def mel_window(self, seek: int, n_ctx_used: Optional[int] = None) -> jax.Array:
        """Slice mel [seek, seek+2*n_ctx), zero-padded (reference conv graph
        input handling, src/whisper.cpp:2389-2421). Returns (1, n_mels, 2*ctx)."""
        hp = self.ctx.hparams
        n_ctx = n_ctx_used or hp.n_audio_ctx
        want = 2 * n_ctx
        mel = self.mel
        pad = want + max(0, seek)  # always enough
        padded = jnp.pad(mel, ((0, 0), (0, pad)))
        win = jax.lax.dynamic_slice(padded, (0, seek), (mel.shape[0], want))
        return win[None]

    # -------------------------------------------------------------- encode
    def encode(self, offset: int = 0, n_ctx_used: Optional[int] = None) -> jax.Array:
        """Run conv+encoder+cross graphs for the 30 s window at mel offset
        (reference whisper_encode_internal, src/whisper.cpp:2376-2472)."""
        ctx = self.ctx
        hp = ctx.hparams
        t0 = time.perf_counter()
        mel_win = self.mel_window(offset, n_ctx_used)
        # Pallas fused attention on TPU (reference flash_attn path,
        # src/whisper.cpp:2159-2207); XLA attention elsewhere (the Pallas
        # interpreter on CPU is orders slower than XLA's fusion)
        use_flash = ctx.cparams.flash_attn and ctx.exec_backend == "tpu"
        embed = _encode_jit(ctx.params, hp, mel_win, ctx.dtype, use_flash)
        self.audio_embed = embed
        self.cross_k, self.cross_v = _cross_kv_jit(
            ctx.params, hp, embed, ctx.kv_quant)
        jax.block_until_ready(self.cross_k)
        self.timings.add("encode", time.perf_counter() - t0)
        return embed

    def encode_draft(self, offset: int = 0, n_ctx_used: Optional[int] = None) -> None:
        """Encoder + cross-KV of the attached DRAFT model for the window at
        mel offset (speculative decoding). Requires `draft_mel` — computed
        by run_full from the same (VAD-filtered) samples with the draft's
        own filterbank — unless `draft_shares_encoder` is set, in which
        case the main model's encoder output (distil drafts freeze the
        teacher's encoder) is projected through the draft's cross-KV
        weights and the whole draft encoder pass is skipped."""
        draft = self.ctx.draft
        if draft is None:
            raise RuntimeError("no draft model")
        if self.ctx.cparams.draft_shares_encoder:
            if self.audio_embed is None:
                raise RuntimeError("encode() must run before encode_draft()")
            t0 = time.perf_counter()
            self.draft_cross_k, self.draft_cross_v = _cross_kv_jit(
                draft.params, draft.hparams, self.audio_embed,
                self.ctx.kv_quant)
            self.timings.add("encode", time.perf_counter() - t0)
            return
        if self.draft_mel is None:
            raise RuntimeError("no draft mel")
        hp = draft.hparams
        t0 = time.perf_counter()
        n_ctx = n_ctx_used or hp.n_audio_ctx
        want = 2 * n_ctx
        mel = self.draft_mel
        padded = jnp.pad(mel, ((0, 0), (0, want + max(0, offset))))
        win = jax.lax.dynamic_slice(padded, (0, offset), (mel.shape[0], want))[None]
        use_flash = draft.cparams.flash_attn and draft.exec_backend == "tpu"
        embed = _encode_jit(draft.params, hp, win, draft.dtype, use_flash)
        self.draft_cross_k, self.draft_cross_v = _cross_kv_jit(
            draft.params, hp, embed, self.ctx.kv_quant)
        self.timings.add("encode", time.perf_counter() - t0)

    # -------------------------------------------------------------- decode
    def new_kv_cache(self, batch: int) -> model_mod.KVCache:
        return model_mod.KVCache.zeros(self.ctx.hparams, batch, self.ctx.dtype,
                                       quant=self.ctx.kv_quant)

    def decode(
        self,
        tokens: Sequence[int] | np.ndarray,
        pos0: int,
        kv: model_mod.KVCache,
        batch: int = 1,
    ) -> Tuple[jax.Array, model_mod.KVCache]:
        """Low-level batched decode (reference whisper_decode_internal,
        src/whisper.cpp:2864-2993). tokens: (T,) replicated over batch, or
        (B, T). Returns (logits[B, T, V] f32, updated kv)."""
        ctx = self.ctx
        toks = np.asarray(tokens, dtype=np.int32)
        if toks.ndim == 1:
            toks = np.broadcast_to(toks, (batch, toks.shape[0]))
        ck, cv = self.cross_k, self.cross_v
        # batch-1 encoder K/V is shared across the decode batch inside
        # decoder_forward (no broadcast materialization)
        ck_b = (ck[0] if isinstance(ck, tuple) else ck).shape[1]
        if ck_b not in (1, toks.shape[0]):
            raise ValueError(
                f"cross-KV batch {ck_b} incompatible with decode "
                f"batch {toks.shape[0]}")
        t0 = time.perf_counter()
        logits, kv = _decode_jit(
            ctx.params, ctx.hparams, jnp.asarray(toks), jnp.asarray(pos0, jnp.int32),
            kv, ck, cv, ctx.dtype)
        logits.block_until_ready()
        self.timings.add("decode" if toks.shape[1] == 1 else "prompt",
                         time.perf_counter() - t0)
        self._last_logits = logits
        return logits, kv

    # ---------------------------------------------------------------- full
    def full(self, params: FullParams, samples: np.ndarray) -> int:
        """THE main entry point (reference whisper_full_with_state,
        src/whisper.cpp:6795-7711). Returns 0 on success; segments are
        available via the getters below."""
        from whisper_tpu.decoding.loop import run_full
        self.segments = run_full(self, params, samples)
        return 0

    # segment getters (reference whisper_full_get_segment_* family)
    def full_n_segments(self) -> int:
        return len(self.segments)

    def full_get_segment(self, i: int) -> Segment:
        return self.segments[i]

    def full_get_segment_text(self, i: int) -> str:
        return self.segments[i].text

    def full_get_segment_t0(self, i: int) -> int:
        return self.segments[i].t0

    def full_get_segment_t1(self, i: int) -> int:
        return self.segments[i].t1

    def full_n_tokens(self, i: int) -> int:
        return len(self.segments[i].tokens)

    def full_get_token_data(self, i: int, j: int) -> TokenData:
        return self.segments[i].tokens[j]

    def full_get_token_id(self, i: int, j: int) -> int:
        return self.segments[i].tokens[j].id

    def full_get_token_prob(self, i: int, j: int) -> float:
        """reference whisper_full_get_token_p."""
        return self.segments[i].tokens[j].p

    def full_get_segment_no_speech_prob(self, i: int) -> float:
        return self.segments[i].no_speech_prob

    def full_get_segment_speaker_turn_next(self, i: int) -> bool:
        return self.segments[i].speaker_turn_next

    def full_lang_id(self) -> int:
        """reference whisper_full_lang_id (src/whisper.cpp:7875).
        (whisper_n_len / n_len_org are the plain attributes n_len and
        n_len_org on this object.)"""
        return self.lang_id

    def full_get_token_text(self, i: int, j: int) -> str:
        return self.ctx.tokenizer.token_str(self.segments[i].tokens[j].id)

    def full_get_all_text(self) -> str:
        return "".join(s.text for s in self.segments)

    def full_parallel(self, params: FullParams, samples: np.ndarray,
                      n_processors: int) -> int:
        """Split the audio into n chunks and merge results with timestamp
        offsets + overlap clamping (reference whisper_full_parallel,
        src/whisper.cpp:7736-7864 — its entire 'distributed' story).

        The reference runs chunks on host threads; here all chunks advance
        TOGETHER through the continuous-batching path (one batched encoder
        call and one batched on-device token loop per round — see
        decoding/batch_full.py), so -p N buys real MXU-batch concurrency.
        Merge semantics are the reference's: per-chunk timestamp offset +
        overlap clamping; same accuracy caveat at boundaries (:7861)."""
        if n_processors <= 1:
            return self.full(params, samples)

        # VAD applies ONCE to the whole audio BEFORE the split (reference
        # :7748-7760: workers run whisper_full_with_state, which has no VAD
        # step). The reference still remaps output times: whisper_vad left
        # the mapping table on ctx->state and the segment GETTERS translate
        # through it (:7934, :7948) — so the merged segments are remapped
        # at the end here too.
        import copy
        params = copy.copy(params)
        vad_mapping = None
        if params.vad:
            from whisper_tpu.models.vad import vad_filter_audio
            filtered, vad_mapping = vad_filter_audio(self, samples, params)
            if filtered is None or len(filtered) == 0:
                self.segments = []
                return 0
            samples = filtered
            params.vad = False

        offset_samples = (cfg.SAMPLE_RATE * params.offset_ms) // 1000
        n_per = (len(samples) - offset_samples) // n_processors

        pc = copy.copy(params)
        pc.offset_ms = 0
        pc.print_progress = False
        pc.new_segment_callback = None
        pc.progress_callback = None

        chunks = []
        for i in range(n_processors):
            start = offset_samples + i * n_per
            end = len(samples) if i == n_processors - 1 else start + n_per
            chunks.append(np.asarray(samples[start:end], np.float32))

        from whisper_tpu.decoding.batch_full import run_full_batch
        lang_sink: list = []
        per_chunk = run_full_batch(self.ctx, pc, chunks,
                                   timings_sink=self.timings,
                                   lang_sink=lang_sink)
        if lang_sink:
            # reference: chunk 0 runs on ctx->state, so full_lang_id()
            # reflects its detection (src/whisper.cpp:7875; r4 review)
            self.lang_id = lang_sink[0]

        # merge with timestamp offset + overlap clamp (:7812-7846)
        offset_t = params.offset_ms // 10
        self.segments = []
        for i, segs in enumerate(per_chunk):
            shift = 100 * (i * n_per) // cfg.SAMPLE_RATE + offset_t
            for seg in segs:
                seg.t0 += shift
                seg.t1 += shift
                if self.segments:
                    seg.t0 = max(seg.t0, self.segments[-1].t1)
                self.segments.append(seg)
                if params.new_segment_callback:
                    params.new_segment_callback(self.ctx, self, seg)
        if vad_mapping:
            from whisper_tpu.models.vad import remap_segment_times
            self.vad_mapping = vad_mapping
            for seg in self.segments:
                remap_segment_times(seg, vad_mapping)
        return 0

    def lang_detect(self, offset_ms: int = 0) -> Tuple[int, np.ndarray]:
        from whisper_tpu.decoding.language import lang_auto_detect
        return lang_auto_detect(self, offset_ms)

    def print_timings(self) -> str:
        return self.timings.report()

    def get_timings(self):
        """Phase totals/counts (reference whisper_get_timings,
        src/whisper.cpp:4261-4279)."""
        return self.timings.as_dict()

    def reset_timings(self) -> None:
        """reference whisper_reset_timings (src/whisper.cpp:4298-4312)."""
        self.timings.reset()

    def get_logits(self) -> Optional[np.ndarray]:
        """Logits of the most recent decode() call, (B*T, n_vocab) float32
        (reference whisper_get_logits_from_state, src/whisper.cpp:4150-4156;
        row layout matches the C API's flat [n_tokens, n_vocab])."""
        if self._last_logits is None:
            return None
        arr = np.asarray(self._last_logits, dtype=np.float32)
        return arr.reshape(-1, arr.shape[-1])


# ---------------------------------------------------------------------------
# jitted kernels (module-level so jax's cache is shared across states)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("hp", "dtype", "use_flash"))
def _encode_jit(params, hp, mel_win, dtype, use_flash=False):
    attn_fn = None
    if use_flash:
        from whisper_tpu.ops.flash_attention import encoder_attn_fn
        attn_fn = encoder_attn_fn
    return model_mod.encoder_forward(params, hp, mel_win, dtype, attn_fn)


@functools.partial(jax.jit, static_argnames=("hp", "quant"))
def _cross_kv_jit(params, hp, embed, quant=False):
    return model_mod.cross_attention_kv(params, hp, embed, quant=quant)


@functools.partial(jax.jit, static_argnames=("hp", "dtype"), donate_argnames=("kv",))
def _decode_jit(params, hp, tokens, pos0, kv, cross_k, cross_v, dtype):
    return model_mod.decode_logits_only(params, hp, tokens, pos0, kv, cross_k, cross_v, dtype)
