"""Model quantizer — re-encode a ggml .bin with a target quantization type.

reference examples/quantize/quantize.cpp + examples/common-ggml.cpp:45-238:
only 2-D tensors get quantized; explicit skip list for conv biases and
positional embeddings; everything else passes through unchanged.

Usage: python -m whisper_tpu.tools.quantize model.bin model-q5_0.bin q5_0
"""

from __future__ import annotations

import re
import sys
from typing import Dict, Tuple

import numpy as np

from whisper_tpu.checkpoint import ggml_io, quant

# reference quantize.cpp:159-166
SKIP_PATTERNS = [
    "encoder.conv1.bias",
    "encoder.conv2.bias",
    "encoder.positional_embedding",
    "decoder.positional_embedding",
]

NAME_TO_TYPE = {
    "q4_0": quant.GGML_TYPE_Q4_0,
    "q4_1": quant.GGML_TYPE_Q4_1,
    "q5_0": quant.GGML_TYPE_Q5_0,
    "q5_1": quant.GGML_TYPE_Q5_1,
    "q8_0": quant.GGML_TYPE_Q8_0,
    # K-quant super-block formats (reference common-ggml.cpp:12-16)
    "q2_k": quant.GGML_TYPE_Q2_K,
    "q3_k": quant.GGML_TYPE_Q3_K,
    "q4_k": quant.GGML_TYPE_Q4_K,
    "q5_k": quant.GGML_TYPE_Q5_K,
    "q6_k": quant.GGML_TYPE_Q6_K,
    "f16": quant.GGML_TYPE_F16,
    "f32": quant.GGML_TYPE_F32,
}


def quantize_model(in_path: str, out_path: str, qtype_name: str) -> Dict[str, int]:
    """Returns per-tensor output types (for logging/tests)."""
    qtype = NAME_TO_TYPE[qtype_name.lower()]
    ckpt = ggml_io.read_ggml(in_path)

    out_tensors: Dict[str, Tuple[np.ndarray, int]] = {}
    type_log: Dict[str, int] = {}
    for name, rt in ckpt.tensors.items():
        skip = any(re.fullmatch(p, name) for p in SKIP_PATTERNS)
        # rows must divide the block (256 for K-quants): the reference tool
        # asserts inside ggml_quantize_chunk; we pass such tensors through
        # unquantized instead (per-tensor ttypes keep the file loadable)
        blk = quant.block_size(qtype) if qtype in quant.TYPE_TRAITS else 32
        do_quant = (not skip and len(rt.ne) == 2
                    and rt.ttype in (quant.GGML_TYPE_F32, quant.GGML_TYPE_F16)
                    and rt.ne[0] % blk == 0)
        target = qtype if do_quant else rt.ttype
        out_tensors[name] = (rt.to_float32(), target)
        type_log[name] = target

    hp = ckpt.hparams
    from whisper_tpu.config import WhisperHParams
    hp_out = WhisperHParams(**{**hp.__dict__,
                               "ftype": quant.TYPE_TO_FTYPE.get(qtype, hp.ftype)})
    ggml_io.write_ggml(out_path, hp_out, ckpt.mel_filters, ckpt.vocab_tokens,
                       out_tensors)
    return type_log


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 3:
        print("usage: quantize model-f32.bin model-quant.bin type\n"
              f"  type: {', '.join(NAME_TO_TYPE)}", file=sys.stderr)
        return 3
    in_path, out_path, qname = argv
    if qname.lower() not in NAME_TO_TYPE:
        print(f"error: invalid quantization type '{qname}'", file=sys.stderr)
        return 3
    log = quantize_model(in_path, out_path, qname)
    n_q = sum(1 for t in log.values() if t == NAME_TO_TYPE[qname.lower()])
    print(f"quantized {n_q}/{len(log)} tensors to {qname}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
