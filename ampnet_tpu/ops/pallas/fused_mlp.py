"""Pallas TPU kernel: fused shared-MLP chain over point windows.

The encoder trunk (the reference's Conv1d(1×1)+BN+ReLU stacks,
``pointNet/model/pointnetAtt.py:66-71``) is a chain of small matmuls over a
``[B·W, N, C]`` tensor. Left to XLA, every layer's activations round-trip through
HBM (~150 MB per layer at the bench geometry) — the op is bandwidth-bound, not
FLOP-bound. This kernel processes ONE WINDOW PER GRID PROGRAM: the window's points
are loaded into VMEM once, the whole layer chain (with inference-folded BatchNorm)
runs against weights resident in VMEM, and only the final layer's activations (and
optionally just the per-window max-pool) are written back.

Memory math at the flagship geometry (N=2048, Cmax=256, fp32): activations ≤ 2 MB +
weights ≤ 0.5 MB per chain — comfortably inside the ~16 MB VMEM budget, so no inner
tiling is needed.

BatchNorm folding (inference): y = ((x@W) − μ)·γ/√(σ²+ε) + β  ≡  x@(W·diag(s)) + t
with s = γ/√(σ²+ε), t = β − μ·s. Training-mode BN needs cross-window batch
statistics and is left to XLA (it fuses that case well already).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_bn(
    kernel: jnp.ndarray,  # [Cin, Cout] dense kernel
    bn_scale: jnp.ndarray,
    bn_bias: jnp.ndarray,
    bn_mean: jnp.ndarray,
    bn_var: jnp.ndarray,
    eps: float = 1e-5,
    dense_bias: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold inference BatchNorm into the preceding dense layer → (W', b')."""
    s = bn_scale / jnp.sqrt(bn_var + eps)
    w = kernel * s[None, :]
    b = bn_bias - bn_mean * s
    if dense_bias is not None:
        b = b + dense_bias * s
    return w, b


def _pick_block_windows(m: int, n: int, cmax: int, dtype_bytes: int = 4) -> int:
    """Windows per grid program, sized to a VMEM budget (lane padding to 128 and a
    couple of live temporaries accounted). Multi-window ROW blocks are 20× faster
    than one-window programs (measured 75.7 → 3.7 ms on the 288×2048×12→64→64
    chain); 3-D blocks with leading dim > 1 fault in Mosaic, hence the 2-D layout
    below."""
    budget = 8 * 1024 * 1024
    per_window = n * max(cmax, 128) * dtype_bytes * 2
    # callers pad m up to a multiple of g (at most g-1 garbage windows), so no
    # divisibility constraint here — shrinking g toward 1 for awkward m would
    # explode the grid into per-window programs. Capped at m: g > m would pad
    # a small call (whole-cloud eval dispatches m=1) up to pure garbage rows.
    return min(8, m, max(1, budget // max(per_window, 1)))


@functools.partial(
    jax.jit,
    static_argnames=("pool", "relu_last", "return_acts", "interpret", "block_windows"),
)
def fused_mlp_chain(
    x: jnp.ndarray,  # [M, N, Cin] — M windows of N points
    weights: Sequence[jnp.ndarray],  # [Cin_i, Cout_i] folded kernels
    biases: Sequence[jnp.ndarray],  # [Cout_i]
    pool: bool = False,
    relu_last: bool = True,
    return_acts: bool = True,
    interpret: bool = False,
    block_windows: int = 0,  # 0 → auto
):
    """Returns activations [M, N, Cout_last] (when ``return_acts``) and/or the
    per-window max [M, Cout_last] (when ``pool``). ``pool=True, return_acts=False``
    writes ONLY the pooled vector back to HBM — the T-Net trunk case, where the
    full activations never leave VMEM at all."""
    m, n, cin = x.shape
    n_layers = len(weights)
    assert len(biases) == n_layers
    assert pool or return_acts
    cout = weights[-1].shape[1]
    cmax = max(w.shape[1] for w in weights)
    g = block_windows or _pick_block_windows(m, n, cmax)
    # pad m up to a multiple of g instead of shrinking g toward 1: a prime m
    # with g=1 would produce an m-program grid, and per-grid-step overhead on
    # this toolchain is ~130-210 µs — the padded windows are bias-only garbage
    # rows sliced off below
    m_real = m
    pad = -m % g
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, n, cin), x.dtype)], axis=0)
        m += pad

    # 2-D blocks throughout: the window axis folds into rows. (3-D blocks with a
    # leading dim > 1 trip a Mosaic pipelining fault at grid ≥ ~32 on this
    # toolchain — bisected: [M,2048,12] g=2 exact through grid 16, aborts at 32.)
    x2 = x.reshape(m * n, cin)
    flat_params = []
    in_specs = [pl.BlockSpec((g * n, cin), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    for w, b in zip(weights, biases):
        flat_params += [w, b.reshape(1, -1)]
        in_specs += [
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b.shape[0]), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]

    out_shape, out_specs = [], []
    if return_acts:
        out_shape.append(jax.ShapeDtypeStruct((m * n, cout), x.dtype))
        out_specs.append(
            pl.BlockSpec((g * n, cout), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
    if pool:
        # pooled output as [m//g, g, cout] with a (1, g, cout) block: the last two
        # block dims equal the array dims, satisfying Mosaic's tiling constraint
        # for arbitrary g (a 2-D (g, cout) block would need g % 8 == 0)
        out_shape.append(jax.ShapeDtypeStruct((m // g, g, cout), x.dtype))
        out_specs.append(
            pl.BlockSpec((1, g, cout), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        )

    def kernel(x_ref, *refs):
        h = x_ref[:]  # [g*n, cin] — windows merged into one MXU M-dim
        for i in range(n_layers):
            w = refs[2 * i][:]
            b = refs[2 * i + 1][0, :]
            h = jnp.dot(h, w, preferred_element_type=jnp.float32) + b[None, :]
            if i < n_layers - 1 or relu_last:
                h = jnp.maximum(h, 0.0)
        o = 2 * n_layers
        if return_acts:
            refs[o][:] = h.astype(x.dtype)
            o += 1
        if pool:
            refs[o][:] = jnp.max(h.reshape(1, g, n, cout), axis=2).astype(x.dtype)

    flops = 2 * m * n * sum(int(w.shape[0]) * int(w.shape[1]) for w in weights)
    result = pl.pallas_call(
        kernel,
        grid=(m // g,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=int(x.size * 4 + m * n * cout * 4),
            transcendentals=0,
        ),
    )(x2, *flat_params)
    if return_acts and pool:
        return (result[0].reshape(m, n, cout)[:m_real],
                result[1].reshape(m, cout)[:m_real])
    if pool:
        return result[0].reshape(m, cout)[:m_real]
    return result[0].reshape(m, n, cout)[:m_real]
