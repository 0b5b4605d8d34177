"""Pallas TPU kernel: int8-quantized fused MLP chain.

v5e's MXU runs int8×int8→int32 at 2× the bf16 rate (394 vs 197 TOPS), so a
quantized encoder doubles the compute ceiling of the AMP window encoder — whose
matmuls dominate inference (docs/design.md). Scheme:

* weights: symmetric per-output-channel int8 (absmax), folded BatchNorm included
  (the fp32 fold from ops/pallas/fused_mlp.py runs first);
* activations: dynamic symmetric int8 per block — the scale is computed inside the
  kernel from the live activation absmax, so no calibration pass is needed;
* accumulation: int32 on the MXU, dequantized to fp32 for bias + ReLU between
  layers.

Layout matches the fp32 fused kernel: 2-D row blocks with multiple windows folded
into the MXU M-dim (3-D blocks with leading dim > 1 fault in Mosaic on this
toolchain), whole chain VMEM-resident per grid program.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ampnet_tpu.ops.pallas.fused_mlp import _pick_block_windows


def quantize_weights_per_channel(
    w: jnp.ndarray,  # [Cin, Cout] (BN already folded)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric absmax per output channel → (int8 weights, fp32 scales [Cout])."""
    absmax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    return wq, scale.astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("pool", "relu_last", "return_acts", "interpret", "block_windows"),
)
def quantized_mlp_chain(
    x: jnp.ndarray,  # [M, N, Cin] fp32 — M windows of N points
    wq: Sequence[jnp.ndarray],  # int8 [Cin_i, Cout_i]
    w_scale: Sequence[jnp.ndarray],  # fp32 [Cout_i]
    biases: Sequence[jnp.ndarray],  # fp32 [Cout_i]
    pool: bool = False,
    relu_last: bool = True,
    return_acts: bool = True,
    interpret: bool = False,
    block_windows: int = 0,
):
    """int8 version of fused_mlp_chain (dynamic per-block activation scales)."""
    m, n, cin = x.shape
    n_layers = len(wq)
    assert len(w_scale) == n_layers and len(biases) == n_layers  # zip would
    # silently truncate a mismatched layer list into wrong-but-plausible logits
    assert pool or return_acts
    cout = wq[-1].shape[1]
    cmax = max(q.shape[1] for q in wq)
    # int8 keeps more live temporaries per row (fp32 h + int8 hq + int32 acc), so
    # halve the fp32 picker's window group (measured: the fp32-sized block OOMs
    # scoped VMEM by ~4 MB at [288·2048, 12→64→64])
    g = block_windows or max(1, _pick_block_windows(m, n, cmax) // 2)
    # pad m to a multiple of g rather than shrinking g (see fused_mlp_chain:
    # prime m would otherwise degrade to an m-program grid at ~130-210 µs/step)
    m_real = m
    pad = -m % g
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, n, cin), x.dtype)], axis=0)
        m += pad

    x2 = x.reshape(m * n, cin)
    flat_params: List[jnp.ndarray] = []
    in_specs = [pl.BlockSpec((g * n, cin), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    for q, s, b in zip(wq, w_scale, biases):
        flat_params += [q, s.reshape(1, -1), b.reshape(1, -1)]
        in_specs += [
            pl.BlockSpec(q.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s.shape[0]), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b.shape[0]), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]

    out_shape, out_specs = [], []
    if return_acts:
        out_shape.append(jax.ShapeDtypeStruct((m * n, cout), jnp.float32))
        out_specs.append(
            pl.BlockSpec((g * n, cout), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
    if pool:
        out_shape.append(jax.ShapeDtypeStruct((m // g, g, cout), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, g, cout), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        )

    def kernel(x_ref, *refs):
        h = x_ref[:].astype(jnp.float32)  # [g*n, cin]
        for i in range(n_layers):
            q = refs[3 * i][:]
            s_w = refs[3 * i + 1][0, :]
            b = refs[3 * i + 2][0, :]
            # dynamic symmetric activation quantization (per block)
            s_x = jnp.maximum(jnp.max(jnp.abs(h)), 1e-12) / 127.0
            hq = jnp.clip(jnp.round(h / s_x), -127, 127).astype(jnp.int8)
            acc = jnp.dot(hq, q, preferred_element_type=jnp.int32)
            h = acc.astype(jnp.float32) * (s_x * s_w)[None, :] + b[None, :]
            if i < n_layers - 1 or relu_last:
                h = jnp.maximum(h, 0.0)
        o = 3 * n_layers
        if return_acts:
            refs[o][:] = h
            o += 1
        if pool:
            refs[o][:] = jnp.max(h.reshape(1, g, n, cout), axis=2)

    flops = 2 * m * n * sum(int(q.shape[0]) * int(q.shape[1]) for q in wq)
    result = pl.pallas_call(
        kernel,
        grid=(m // g,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=int(x.size * 4), transcendentals=0
        ),
    )(x2, *flat_params)
    if return_acts and pool:
        return (result[0].reshape(m, n, cout)[:m_real],
                result[1].reshape(m, cout)[:m_real])
    if pool:
        return result[0].reshape(m, cout)[:m_real]
    return result[0].reshape(m, n, cout)[:m_real]


def quantize_chain(weights: Sequence[jnp.ndarray]):
    """Quantize a list of folded fp32 kernels → (int8 list, scale list)."""
    qs, ss = [], []
    for w in weights:
        q, s = quantize_weights_per_channel(w)
        qs.append(q)
        ss.append(s)
    return qs, ss
