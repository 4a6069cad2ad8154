"""Fused LayerNorm for the bf16 ViT trunk (Pallas, TPU).

Why this exists: XLA lowers the trunk's layernorms (``models/vit.py
_layer_norm`` — f32 statistics over a bf16 activation, matching torch
``nn.LayerNorm``; reference src/dino/vision_transformer.py Block) as a
convert→reduce→reduce→normalize chain that reads the activation several
times. Profiling the batch-8 train step showed 12 ``convert_reduce``
fusions at ~0.17 ms each where a memory-bound single pass would be
~0.04 ms (scripts/profile_report.py, TODO.md item 6). This kernel does
one read + one write per row block: load a (TR, D) bf16 tile, compute
mean/var in f32 on the VPU, normalize, scale+shift, store bf16.

Forward-only by design — the DINO backbone is frozen everywhere it runs
(stego_tpu/models/featurizer.py applies stop_gradient), but a custom VJP
with the standard layernorm backward (plain XLA) is attached so stray
``jax.grad`` through the trunk (tests, experiments) still works.

Dispatch: ``models/vit.py _layer_norm`` routes here only on the unrolled
Pallas trunk path (``use_flash=True``) — the scanned trunk and all
``jax.export`` artifacts keep the pure-XLA form (Mosaic custom calls are
not portable across backends, and Pallas-in-scan hits the >10 min Mosaic
compile cliff; CLAUDE.md). Multi-device meshes shard rows via
``parallel/mesh.py:shard_kernel`` like every other kernel here.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TR = 512  # rows per grid step; (TR, D) f32 temp = 0.75 MB at D=384


def _ln_kernel(x_ref, g_ref, b_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)  # (TR, D)
    d = x.shape[1]
    mean = jnp.sum(x, axis=1, keepdims=True) * (1.0 / d)
    xc = x - mean
    var = jnp.sum(xc * xc, axis=1, keepdims=True) * (1.0 / d)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


def _ln_forward(x2: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                eps: float, interpret: bool) -> jnp.ndarray:
    """x2: (R, D). Returns layernormed (R, D) in x2.dtype."""
    r, d = x2.shape
    r_pad = -(-r // TR) * TR
    xp = jnp.pad(x2, ((0, r_pad - r), (0, 0))) if r_pad != r else x2
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(r_pad // TR,),
        in_specs=[
            pl.BlockSpec((TR, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TR, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r_pad, d), x2.dtype),
        interpret=interpret,
    )(xp, scale.reshape(1, d), bias.reshape(1, d))
    return out[:r] if r_pad != r else out


def _add_ln_kernel(x_ref, y_ref, g_ref, b_ref, r_ref, o_ref, *, eps: float):
    xf = x_ref[...].astype(jnp.float32)
    yf = y_ref[...].astype(jnp.float32)
    r16 = (xf + yf).astype(r_ref.dtype)
    r_ref[...] = r16
    # LN reads the ROUNDED sum so the result is bit-identical to the
    # sequential XLA form (bf16 add, then f32-stats layernorm).
    x = r16.astype(jnp.float32)
    d = x.shape[1]
    mean = jnp.sum(x, axis=1, keepdims=True) * (1.0 / d)
    xc = x - mean
    var = jnp.sum(xc * xc, axis=1, keepdims=True) * (1.0 / d)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


def _add_ln_forward(x2, y2, scale, bias, eps, interpret, out_dtype):
    r, d = x2.shape
    r_pad = -(-r // TR) * TR
    if r_pad != r:
        x2 = jnp.pad(x2, ((0, r_pad - r), (0, 0)))
        y2 = jnp.pad(y2, ((0, r_pad - r), (0, 0)))
    res, out = pl.pallas_call(
        functools.partial(_add_ln_kernel, eps=eps),
        grid=(r_pad // TR,),
        in_specs=[
            pl.BlockSpec((TR, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TR, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r_pad, d), x2.dtype),
            jax.ShapeDtypeStruct((r_pad, d), out_dtype),
        ],
        interpret=interpret,
    )(x2, y2, scale.reshape(1, d), bias.reshape(1, d))
    if r_pad != r:
        res, out = res[:r], out[:r]
    return res, out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _add_ln(x2, y2, scale, bias, eps, interpret, out_dtype):
    return _add_ln_forward(x2, y2, scale, bias, eps, interpret, out_dtype)


def _add_ln_fwd(x2, y2, scale, bias, eps, interpret, out_dtype):
    r, o = _add_ln_forward(x2, y2, scale, bias, eps, interpret, out_dtype)
    return (r, o), (r, scale)


def _add_ln_bwd(eps, interpret, out_dtype, res, cts):
    r, scale = res
    dr_in, do = cts
    dx_ln, dg, db = _ln_bwd(eps, interpret, (r, scale), do)
    dr = dr_in.astype(jnp.float32) + dx_ln.astype(jnp.float32)
    return dr.astype(r.dtype), dr.astype(r.dtype), dg, db


_add_ln.defvjp(_add_ln_fwd, _add_ln_bwd)


def add_layer_norm(
    x: jnp.ndarray, y: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
    eps: float, interpret: bool | None = None, mesh=None,
    out_dtype=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused residual-add + LayerNorm: returns ``(x + y, LN(x + y))``.

    Bit-identical to the sequential form (the sum is rounded to x.dtype
    before the f32 statistics). **Kept un-dispatched**: the profiler showed
    ~0.31 ms ``add_add`` fusions per residual at (32, 785, 384) bf16, but
    those spans are in-flight time overlapped with the Pallas attention
    calls, not exclusive cost (the xplane caveat, CLAUDE.md) — wiring this
    into the unrolled trunk measured 17.30 ms fwd b=32 vs 16.81 ms for the
    plain :func:`fused_layer_norm` form (the extra output write and second
    input read outweigh the add it absorbs). May win on chips with more
    HBM headroom; measure before dispatching.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    # the VJP returns both cotangents in x.dtype; a mixed-dtype y would get
    # a wrong-dtype cotangent and custom_vjp would reject it
    assert x.dtype == y.dtype, (x.dtype, y.dtype)
    shape = x.shape
    d = shape[-1]
    out_dtype = x.dtype if out_dtype is None else out_dtype

    def run(x2, y2, scale, bias):
        return _add_ln(x2, y2, scale, bias, float(eps), bool(interpret),
                       out_dtype)

    from stego_tpu.parallel.mesh import shard_kernel

    r, o = shard_kernel(run, mesh, 2, n_out=2, n_rep=2)(
        x.reshape(-1, d), y.reshape(-1, d), scale, bias)
    return r.reshape(shape), o.reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _ln(x2, scale, bias, eps, interpret):
    return _ln_forward(x2, scale, bias, eps, interpret)


def _ln_fwd(x2, scale, bias, eps, interpret):
    return _ln_forward(x2, scale, bias, eps, interpret), (x2, scale)


def _ln_bwd(eps, interpret, res, dy):
    # Standard layernorm VJP in plain XLA (never on the hot path — the
    # trunk is frozen; exists so jax.grad through the backbone still works).
    x2, scale = res
    xf = x2.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    mean = jnp.mean(xf, axis=1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = xc * inv
    dg = jnp.sum(dyf * xhat, axis=0).astype(scale.dtype)
    db = jnp.sum(dyf, axis=0).astype(scale.dtype)
    dxhat = dyf * scale.astype(jnp.float32)
    dx = inv * (dxhat - jnp.mean(dxhat, axis=1, keepdims=True)
                - xhat * jnp.mean(dxhat * xhat, axis=1, keepdims=True))
    return dx.astype(x2.dtype), dg, db


_ln.defvjp(_ln_fwd, _ln_bwd)


def fused_layer_norm(
    x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps: float,
    interpret: bool | None = None, mesh=None,
) -> jnp.ndarray:
    """LayerNorm over the last axis with f32 statistics, fused single-pass.

    Matches ``models/vit.py _layer_norm`` (and torch nn.LayerNorm) to f32
    rounding. x: (..., D); scale/bias: (D,).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    shape = x.shape
    d = shape[-1]
    x2 = x.reshape(-1, d)

    def run(x2, scale, bias):
        return _ln(x2, scale, bias, float(eps), bool(interpret))

    from stego_tpu.parallel.mesh import shard_kernel

    out = shard_kernel(run, mesh, 1, n_rep=2)(x2, scale, bias)
    return out.reshape(shape)
