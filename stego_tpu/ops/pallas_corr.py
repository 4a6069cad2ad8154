"""Fused contrastive-correlation loss as a Pallas TPU kernel.

The reference materializes per-pair correspondence tensors
``B x H x W x I x J`` (src/modules.py:283-284,325-347) — O((HW)^2) memory that
forces it to subsample 11x11 coordinates. This kernel streams the computation
flash-attention-style: for each (batch, row-tile) it loops over column tiles,
computing the feature- and code-correlation tiles on the MXU and reducing them
into per-row accumulators in VMEM. **No N x N tensor ever reaches HBM**, making
full-field (HW x HW) correspondence loss tractable (SURVEY.md §5 — this is the
repo's "ring-attention equivalent").

Math (identical to ops/correlation.py, the einsum oracle):
    fd = f̂1 @ f̂2ᵀ   (stop-grad)        cd = ĉ1 @ ĉ2ᵀ
    pointwise:  fd' = fd - rowmean_j(fd) + globalmean(fd)
    loss = mean( -clamp(cd) * (fd' - shift) )

The streaming trick: with per-row partial sums
    s1 = Σ_j clamp(cd)·fd,   s2 = Σ_j clamp(cd),   s3 = Σ_j fd
the total loss is a closed form in (s1, s2, s3) — a single pass suffices, and
the tiny (B, N) reductions finalize in plain XLA.

Backward recomputes fd/cd tiles (never stored) and contracts the analytic
dL/dcd against ĉ2 / ĉ1; residuals are just the (B, N) rowmeans + a scalar.
Gradients flow to the code path only (features are frozen upstream).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stego_tpu.ops.math import l2_normalize

TQ = 128  # row tile
TK = 128  # column tile
NEG_INF_MIN = -9999.0  # reference's "no clamp" lower bound (modules.py:340)


def _pad_axis(x: jnp.ndarray, mult: int, axis: int) -> jnp.ndarray:
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


class _Static(NamedTuple):
    shift: float
    pointwise: bool
    zero_clamp: bool
    stabalize: bool
    n_real: int
    interpret: bool


def _clamp_bounds(st: _Static) -> Tuple[float, float]:
    lo = 0.0 if st.zero_clamp else NEG_INF_MIN
    hi = 0.8 if st.stabalize else jnp.inf
    return lo, hi


# ----------------------------------------------------------------------
# forward kernel


def _fwd_kernel(f1_ref, f2_ref, c1_ref, c2_ref, acc_ref, *, lo, hi):
    """acc rows: 0=s1, 1=s2, 2=s3, 3=cd_sum (over the col dimension)."""
    q = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when((q == 0) & (k == 0))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    fd = jax.lax.dot_general(
        f1_ref[0], f2_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    cd = jax.lax.dot_general(
        c1_ref[0], c2_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    cdc = jnp.clip(cd, lo, hi)
    sl = pl.ds(q * TQ, TQ)
    acc_ref[0, 0, sl] += jnp.sum(cdc * fd, axis=1)
    acc_ref[0, 1, sl] += jnp.sum(cdc, axis=1)
    acc_ref[0, 2, sl] += jnp.sum(fd, axis=1)
    acc_ref[0, 3, sl] += jnp.sum(cd, axis=1)


def _run_fwd(f1, f2, c1, c2, st: _Static):
    b, n_pad, cf = f1.shape
    cc = c1.shape[-1]
    nq, nk = n_pad // TQ, n_pad // TK
    lo, hi = _clamp_bounds(st)

    row_spec_f1 = pl.BlockSpec((1, TQ, cf), lambda b, q, k: (b, q, 0),
                               memory_space=pltpu.VMEM)
    col_spec_f2 = pl.BlockSpec((1, TK, cf), lambda b, q, k: (b, k, 0),
                               memory_space=pltpu.VMEM)
    row_spec_c1 = pl.BlockSpec((1, TQ, cc), lambda b, q, k: (b, q, 0),
                               memory_space=pltpu.VMEM)
    col_spec_c2 = pl.BlockSpec((1, TK, cc), lambda b, q, k: (b, k, 0),
                               memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec((1, 8, n_pad), lambda b, q, k: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    acc = pl.pallas_call(
        functools.partial(_fwd_kernel, lo=lo, hi=hi),
        grid=(b, nq, nk),
        in_specs=[row_spec_f1, col_spec_f2, row_spec_c1, col_spec_c2],
        out_specs=acc_spec,
        out_shape=jax.ShapeDtypeStruct((b, 8, n_pad), jnp.float32),
        interpret=st.interpret,
    )(f1, f2, c1, c2)
    return acc[:, 0], acc[:, 1], acc[:, 2], acc[:, 3]


def _finalize(s1, s2, s3, cds, st: _Static):
    n = st.n_real
    b = s1.shape[0]
    m = b * n * n  # real element count
    s1r, s2r, s3r = s1[:, :n], s2[:, :n], s3[:, :n]
    big_s1, big_s2 = jnp.sum(s1r), jnp.sum(s2r)
    gm = jnp.sum(s3r) / m
    if st.pointwise:
        rowterm = jnp.sum(s3r * s2r) / n
        loss_sum = -(big_s1 - rowterm + (gm - st.shift) * big_s2)
    else:
        loss_sum = -(big_s1 - st.shift * big_s2)
    loss = loss_sum / m
    cd_mean = jnp.sum(cds[:, :n]) / m
    rowmean = (s3 / n)[:, None, :]  # (B, 1, N_pad); padded rows harmlessly zero
    return loss, cd_mean, rowmean, gm


# ----------------------------------------------------------------------
# backward kernels


def _coeff_tile(f1_ref, f2_ref, c1_ref, c2_ref, rm_ref, sc_ref, q,
                lo, hi, pointwise):
    """Recompute the (TQ, TK) dL/dcd tile (fd/cd are never stored)."""
    g_loss = sc_ref[0, 0]
    g_cdm = sc_ref[0, 1]
    gm = sc_ref[0, 2]
    shift = sc_ref[0, 3]
    inv_m = sc_ref[0, 4]

    fd = jax.lax.dot_general(
        f1_ref[0], f2_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    cd = jax.lax.dot_general(
        c1_ref[0], c2_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    mask = ((cd >= lo) & (cd <= hi)).astype(jnp.float32)
    if pointwise:
        rm = rm_ref[0, 0, pl.ds(q * TQ, TQ)]
        fdp = fd - rm[:, None] + gm
    else:
        fdp = fd
    return (-(fdp - shift) * mask * g_loss + g_cdm) * inv_m


def _bwd_kernel_dc1(f1_ref, f2_ref, c1_ref, c2_ref, rm_ref, sc_ref,
                    dc1_ref, *, lo, hi, pointwise):
    q = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        dc1_ref[...] = jnp.zeros_like(dc1_ref)

    coeff = _coeff_tile(f1_ref, f2_ref, c1_ref, c2_ref, rm_ref, sc_ref, q,
                        lo, hi, pointwise)
    dc1_ref[0] += jnp.dot(coeff, c2_ref[0],
                          preferred_element_type=jnp.float32)


def _bwd_kernel_dc2(f1_ref, f2_ref, c1_ref, c2_ref, rm_ref, sc_ref,
                    dc2_ref, *, lo, hi, pointwise):
    q = pl.program_id(2)

    @pl.when(q == 0)
    def _():
        dc2_ref[...] = jnp.zeros_like(dc2_ref)

    coeff = _coeff_tile(f1_ref, f2_ref, c1_ref, c2_ref, rm_ref, sc_ref, q,
                        lo, hi, pointwise)
    # dc2_j += Σ_i coeff_ij * c1_i  — contract over the row dimension
    dc2_ref[0] += jax.lax.dot_general(
        coeff, c1_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _run_bwd(f1, f2, c1, c2, rowmean, scalars, st: _Static):
    b, n_pad, cf = f1.shape
    cc = c1.shape[-1]
    nq, nk = n_pad // TQ, n_pad // TK
    lo, hi = _clamp_bounds(st)

    sc_spec = pl.BlockSpec((1, 8), lambda *_: (0, 0),
                           memory_space=pltpu.SMEM)

    # dc1: grid (b, q, k) — k innermost, dc1 block revisited across k
    dc1 = pl.pallas_call(
        functools.partial(_bwd_kernel_dc1, lo=lo, hi=hi,
                          pointwise=st.pointwise),
        grid=(b, nq, nk),
        in_specs=[
            pl.BlockSpec((1, TQ, cf), lambda b, q, k: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TK, cf), lambda b, q, k: (b, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TQ, cc), lambda b, q, k: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TK, cc), lambda b, q, k: (b, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad), lambda b, q, k: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            sc_spec,
        ],
        out_specs=pl.BlockSpec((1, TQ, cc), lambda b, q, k: (b, q, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, cc), jnp.float32),
        interpret=st.interpret,
    )(f1, f2, c1, c2, rowmean, scalars)

    # dc2: grid (b, k, q) — q innermost, dc2 block revisited across q
    dc2 = pl.pallas_call(
        functools.partial(_bwd_kernel_dc2, lo=lo, hi=hi,
                          pointwise=st.pointwise),
        grid=(b, nk, nq),
        in_specs=[
            pl.BlockSpec((1, TQ, cf), lambda b, k, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TK, cf), lambda b, k, q: (b, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TQ, cc), lambda b, k, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TK, cc), lambda b, k, q: (b, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad), lambda b, k, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            sc_spec,
        ],
        out_specs=pl.BlockSpec((1, TK, cc), lambda b, k, q: (b, k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, cc), jnp.float32),
        interpret=st.interpret,
    )(f1, f2, c1, c2, rowmean, scalars)
    return dc1, dc2


# ----------------------------------------------------------------------
# custom-vjp core on padded, normalized inputs


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused_core(f1, f2, c1, c2, st: _Static):
    s1, s2, s3, cds = _run_fwd(f1, f2, c1, c2, st)
    loss, cd_mean, _, _ = _finalize(s1, s2, s3, cds, st)
    return loss, cd_mean


def _fused_core_fwd(f1, f2, c1, c2, st: _Static):
    s1, s2, s3, cds = _run_fwd(f1, f2, c1, c2, st)
    loss, cd_mean, rowmean, gm = _finalize(s1, s2, s3, cds, st)
    return (loss, cd_mean), (f1, f2, c1, c2, rowmean, gm)


def _fused_core_bwd(st: _Static, residuals, cots):
    f1, f2, c1, c2, rowmean, gm = residuals
    g_loss, g_cdm = cots
    b = f1.shape[0]
    inv_m = 1.0 / (b * st.n_real * st.n_real)
    scalars = jnp.stack([
        g_loss, g_cdm, gm, jnp.float32(st.shift), jnp.float32(inv_m),
        jnp.float32(0), jnp.float32(0), jnp.float32(0),
    ]).reshape(1, 8).astype(jnp.float32)
    dc1, dc2 = _run_bwd(f1, f2, c1, c2, rowmean, scalars, st)
    return jnp.zeros_like(f1), jnp.zeros_like(f2), dc1, dc2


_fused_core.defvjp(_fused_core_fwd, _fused_core_bwd)


# ----------------------------------------------------------------------
# public API


def fused_correlation_loss(
    f1: jnp.ndarray,
    f2: jnp.ndarray,
    c1: jnp.ndarray,
    c2: jnp.ndarray,
    shift: float,
    pointwise: bool = True,
    zero_clamp: bool = True,
    stabalize: bool = False,
    interpret: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused pair loss on NHWC maps.

    Args:
      f1, f2: (B, H, W, Cf) feature maps (frozen; grads do not flow).
      c1, c2: (B, H, W, Cc) code maps (grads flow).
      shift: the pair-type shift (pos_intra/pos_inter/neg_inter).
    Returns:
      (loss_mean, cd_mean) — scalars. loss_mean equals
      ``corr_loss_helper(...)[0].mean()`` from the einsum oracle; cd_mean
      equals the oracle cd tensor's mean (for scalar logging).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, h, w, cf = f1.shape
    n = h * w
    cc = c1.shape[-1]

    def prep(t, c):
        t = t.reshape(b, n, c).astype(jnp.float32)
        t = l2_normalize(t, axis=-1)
        t = _pad_axis(t, TQ, axis=1)
        return _pad_axis(t, 128, axis=2)

    f1p = jax.lax.stop_gradient(prep(f1, cf))
    f2p = jax.lax.stop_gradient(prep(f2, cf))
    c1p = prep(c1, cc)
    c2p = prep(c2, cc)

    st = _Static(
        shift=float(shift), pointwise=bool(pointwise),
        zero_clamp=bool(zero_clamp), stabalize=bool(stabalize),
        n_real=n, interpret=bool(interpret),
    )
    # route grads through prep's normalize/reshape by re-binding via
    # jax.vjp-compatible composition: custom_vjp core takes the padded
    # normalized arrays, XLA autodiffs the prep.
    loss, cd_mean = _fused_core(f1p, f2p, c1p, c2p, st)
    return loss, cd_mean


def contrastive_correlation_loss_fused(
    cfg,
    key: jax.Array,
    orig_feats: jnp.ndarray,
    orig_feats_pos: jnp.ndarray,
    orig_code: jnp.ndarray,
    orig_code_pos: jnp.ndarray,
    full_field: bool = False,
    interpret: bool | None = None,
):
    """Three-pair contrastive loss through the fused kernel.

    Drop-in for :func:`stego_tpu.ops.correlation.contrastive_correlation_loss`
    with scalar cd outputs (no cd tensors — the train step only logs means).
    ``full_field=True`` skips coordinate sampling and runs the loss over the
    complete (HW x HW) correspondence field — the reference's 11x11 subsampled
    loss becomes the exact dense objective (train_config.yml feature_samples).
    The ``neg_samples`` batch-derangement negatives run as ONE kernel launch
    with the pairs stacked along the batch dimension.
    """
    from stego_tpu.ops.correlation import _draw_coords
    from stego_tpu.ops.math import super_perm
    from stego_tpu.ops.sampling import sample_from_coords

    b = orig_feats.shape[0]
    k_c1, k_c2, k_neg = jax.random.split(key, 3)

    if full_field:
        feats, code = orig_feats, orig_code
        feats_pos, code_pos = orig_feats_pos, orig_code_pos
        coords2 = None
    else:
        s = cfg.feature_samples
        coords1 = _draw_coords(k_c1, b, s, None, cfg)
        coords2 = _draw_coords(k_c2, b, s, None, cfg)
        feats = sample_from_coords(orig_feats, coords1)
        code = sample_from_coords(orig_code, coords1)
        feats_pos = sample_from_coords(orig_feats_pos, coords2)
        code_pos = sample_from_coords(orig_code_pos, coords2)

    kw = dict(pointwise=cfg.pointwise, zero_clamp=cfg.zero_clamp,
              stabalize=cfg.stabalize, interpret=interpret)
    pos_intra_loss, pos_intra_cd = fused_correlation_loss(
        feats, feats, code, code, cfg.pos_intra_shift, **kw)
    pos_inter_loss, pos_inter_cd = fused_correlation_loss(
        feats, feats_pos, code, code_pos, cfg.pos_inter_shift, **kw)

    # negatives: stack the derangements along batch — one kernel launch
    perms = [super_perm(b, nk) for nk in jax.random.split(k_neg,
                                                          cfg.neg_samples)]
    if full_field:
        feats_neg = jnp.concatenate([orig_feats[p] for p in perms], axis=0)
        code_neg = jnp.concatenate([orig_code[p] for p in perms], axis=0)
    else:
        feats_neg = jnp.concatenate(
            [sample_from_coords(orig_feats[p], coords2) for p in perms], axis=0)
        code_neg = jnp.concatenate(
            [sample_from_coords(orig_code[p], coords2) for p in perms], axis=0)
    reps = (cfg.neg_samples,) + (1,) * (feats.ndim - 1)
    neg_inter_loss, neg_inter_cd = fused_correlation_loss(
        jnp.tile(feats, reps), feats_neg,
        jnp.tile(code, reps), code_neg,
        cfg.neg_inter_shift, **kw)

    return {
        "pos_intra_loss": pos_intra_loss,
        "pos_intra_cd": pos_intra_cd,
        "pos_inter_loss": pos_inter_loss,
        "pos_inter_cd": pos_inter_cd,
        "neg_inter_loss": neg_inter_loss,
        "neg_inter_cd": neg_inter_cd,
    }
