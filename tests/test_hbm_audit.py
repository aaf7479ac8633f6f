"""Parser/traffic-model tests for tools/hbm_audit.py (the roofline
reconciliation tool — PERF.md "Reconciling the cost model").

The full audit runs on TPU-compiled programs (bench.py emits it every
round); these tests pin the HLO text parser and the loop-detection
heuristic on CPU-compiled programs so tool regressions surface in CI.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from whisper_tpu.tools.hbm_audit import (
    _Sizes,
    _shape_bytes,
    body_traffic,
    find_decode_loops,
    parse_hlo,
)


def _compiled_text(f, *args):
    return jax.jit(f).lower(*args).compile().as_text()


def test_shape_bytes():
    assert _shape_bytes("bf16[32,5,20,512,64]") == 32 * 5 * 20 * 512 * 64 * 2
    assert _shape_bytes("f32[10]") == 40
    assert _shape_bytes("s8[4,4]") == 16
    assert _shape_bytes("pred[7]") == 7


def test_parse_hlo_finds_computations_and_instrs():
    def f(a, b):
        return jnp.dot(a, b) + 1.0

    txt = _compiled_text(
        f, jax.ShapeDtypeStruct((64, 64), jnp.float32),
        jax.ShapeDtypeStruct((64, 64), jnp.float32))
    comps = parse_hlo(txt)
    assert comps, "no computations parsed"
    ops = {i.opcode for c in comps.values() for i in c.instrs}
    assert "parameter" in ops
    # the dot may be fused on some backends; accept either form
    assert ("dot" in ops) or ("fusion" in ops) or ("custom-call" in ops)


def test_find_decode_loops_picks_big_inner_body():
    """Nested while pair: the inner LAYER-like body (many instructions,
    big carry) must win over small helper loops."""

    def f(cache, x):
        def outer(step, carry):
            cache, x = carry

            def inner(li, c):
                cache, x = c
                sl = lax.dynamic_index_in_dim(cache, li, 0, keepdims=False)
                # enough real work that the body isn't trivial
                y = jnp.tanh(x @ sl) + x
                y = jnp.tanh(y @ sl.T) * 0.5
                row = jnp.sum(y, axis=0, keepdims=True)
                sl = lax.dynamic_update_slice(sl, row.astype(sl.dtype), (0, 0))
                cache = lax.dynamic_update_index_in_dim(cache, sl, li, 0)
                return cache, y

            cache, x = lax.fori_loop(0, cache.shape[0], inner, (cache, x))
            # a tiny helper while with a small carry
            s = lax.while_loop(lambda s: s < step, lambda s: s + 1,
                               jnp.int32(0))
            return cache, x + s.astype(x.dtype)

        cache, x = lax.fori_loop(0, 8, outer, (cache, x))
        return cache, x

    txt = _compiled_text(
        f, jax.ShapeDtypeStruct((4, 128, 128), jnp.float32),
        jax.ShapeDtypeStruct((128, 128), jnp.float32))
    comps = parse_hlo(txt)
    token_body, layer_body = find_decode_loops(comps)
    assert token_body is not None and layer_body is not None
    # the chosen inner body must contain the matmul work, not the helper
    sizes = _Sizes(comps)
    traffic = body_traffic(comps, sizes, layer_body)
    assert traffic["gb"] > 0
