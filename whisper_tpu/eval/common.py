"""Shared WER-runner setup (librispeech.py / earnings21.py).

Both harnesses build the same context + decode params from the same CLI
surface; one helper keeps them from drifting (r4 review)."""

from __future__ import annotations

import sys
from typing import Tuple


def build_eval_context(args) -> Tuple[object, object]:
    """(WhisperContext, FullParams) from the shared eval CLI args
    (--model / --beam-size / --draft-model)."""
    from whisper_tpu.api import WhisperContext
    from whisper_tpu.config import ContextParams, FullParams, SamplingStrategy

    cp = None
    if args.draft_model and args.beam_size > 1:
        print("warning: --draft-model ignored (speculative decoding "
              "is greedy-only)", file=sys.stderr)
        args.draft_model = None
    if args.draft_model:
        cp = ContextParams(draft_model=args.draft_model)
    ctx = WhisperContext.new_with_params(args.model, cp)
    p = FullParams.default(SamplingStrategy.BEAM_SEARCH if args.beam_size > 1
                           else SamplingStrategy.GREEDY)
    if args.beam_size > 1:
        p.beam_search.beam_size = args.beam_size
    p.print_progress = False
    return ctx, p
